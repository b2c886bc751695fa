"""Seed-list sources — the reference's task:"url" mode (base_crawler.py:30-37).

The reference reads a newline-delimited URL file with utf-8-sig and strips
newlines (utils/utils.py:9-12); crawl order starts at the file line order.
Seed lists are tiny, so the order-exact reader is driver-side; the
distributed variant (spark.read.text) is provided for bulk seed tables where
order comes from an explicit column instead of file position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_seed_file(spark: SparkSession, path: str) -> DataFrame:
    """Line-ordered seeds: (seed_order, url).  utf-8-sig, stripped."""
    with open(path, encoding="utf-8-sig") as f:
        urls = [ln.strip() for ln in f if ln.strip()]
    return spark.createDataFrame(
        list(enumerate(urls)), "seed_order int, url string"
    )


def read_seed_table(spark: SparkSession, path: str) -> DataFrame:
    """Distributed variant for bulk seed tables (order column required)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.col("url") != "")
    )


def seeds_to_requests(seeds: DataFrame) -> DataFrame:
    """Seed URLs -> frontier-shaped article request rows (X9 routing is the
    caller's concern; raw seed lists in the reference are article URLs)."""
    return seeds.select(
        F.split("url", "/").getItem(2).alias("host"),
        F.lit("article").alias("kind"),
        F.lit(0).alias("type_id"),
        F.lit(1).alias("page_no"),
        F.coalesce(F.col("seed_order"), F.lit(0)).alias("link_index"),
        "url",
    )
