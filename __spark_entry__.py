"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship document-analytics pipeline on sf0.001;
``queries``/``oracle_sql`` expose the full operator registry
(crawler_news_spark/queries.py) with DuckDB twins for every
SQL-expressible operator.  Rows-only entries (custom crawl loop, LSH ANN,
SimHash vUDF, frame sampling) intentionally have no oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_news_spark import queries as Q
from crawler_news_spark.functions import text as TX
from crawler_news_spark.operators import dedup as DD

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: training-data document pipeline — dedup + quality + lang-id
    + token counts + fingerprint over the sf0.001 corpus."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    enriched = docs.select(
        "doc_id",
        "source",
        "lang",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.token_count_ws(F.col("text")).alias("tok_ws"),
        TX.quality_score(F.col("text")).alias("quality_u"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
    )
    kept = DD.keep_first_dedup(enriched, ["fp"], "doc_id")
    return kept.orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
