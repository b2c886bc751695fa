"""Streaming crawl-request intake — the engine's V1/V2 service surface.

The reference accepts on-demand requests two ways: a FastAPI POST /crawl
(app/crawl_request.py:21-69) and a RabbitMQ consumer forwarding to it
(workers/rabbitmq_consumer.py:19-63).  Both reduce to: a stream of JSON
request rows ``{source, action, body.url}`` that are validated, routed
(single article vs whole-site expansion), and injected into the frontier.

Spark-first mapping: a Structured Streaming source (file/rate/kafka — tests
use a file source) -> built-in validation/routing expressions ->
``foreachBatch`` appending frontier rows to the catalog.  Routing rule X9:
an URL ending in 6+ digits + .html is a single article; a bare host/category
URL expands to listing page 1 of every category (vnexpress.py:278-287).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQUEST_SCHEMA = "source string, action string, url string"

ARTICLE_RE = r"\d{6,}\.html$"  # app/crawl_request.py:54


def validate_requests(raw: DataFrame) -> DataFrame:
    """Keep only NEWS/GENERAL requests with a parseable host (crawl_request.py:30-44)."""
    return (
        raw.filter((F.col("source") == "NEWS") & (F.col("action") == "GENERAL"))
        .withColumn("host", F.split("url", "/").getItem(2))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
    )


def route_requests(valid: DataFrame) -> DataFrame:
    """Adds route = 'article' | 'expand' (single URL vs whole-site)."""
    return valid.withColumn(
        "route",
        F.when(F.col("url").rlike(ARTICLE_RE), F.lit("article")).otherwise(
            F.lit("expand")
        ),
    )


def requests_to_frontier_rows(routed: DataFrame, categories: DataFrame) -> DataFrame:
    """Expand routed requests into frontier-shaped rows (wave assigned later).

    'article' -> one article row; 'expand' -> listing page 1 per category of
    the host (the reference's get_all_articles(1), vnexpress.py:278-287).
    """
    singles = routed.filter(F.col("route") == "article").select(
        "host",
        F.lit("article").alias("kind"),
        F.lit(0).alias("type_id"),
        F.lit(1).alias("page_no"),
        F.lit(0).alias("link_index"),
        "url",
    )
    expands = (
        routed.filter(F.col("route") == "expand")
        .join(categories, "host")
        .select(
            "host",
            F.lit("listing").alias("kind"),
            "type_id",
            F.lit(1).alias("page_no"),
            F.lit(0).alias("link_index"),
            "url",
        )
    )
    return singles.unionByName(expands)


def run_intake_stream(
    spark,
    request_dir: str,
    categories: DataFrame,
    sink,  # callable (DataFrame, epoch_id) -> None
    checkpoint_dir: str,
):
    """File-source streaming intake; ``sink`` is the frontier-append foreachBatch."""
    stream = (
        spark.readStream.schema(REQUEST_SCHEMA)
        .json(request_dir)
    )

    def batch_fn(df: DataFrame, epoch_id: int):
        rows = requests_to_frontier_rows(route_requests(validate_requests(df)), categories)
        sink(rows, epoch_id)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
