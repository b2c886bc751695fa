"""Bucketed tables: co-located joins without a shuffle.

At 10^10 rows the repeated join key of this engine is the 64-bit canonical
URL hash (seen-set probes, frontier/articles reconciliation, dedup pair
lookups).  Writing both sides bucketed by that key with the same bucket
count lets Spark's bucketing rule join them with NO Exchange on either side
— the shuffle happens once at write time and is amortized over every later
join.  This module is the thin, tested wrapper the catalog call sites use;
`tests/test_plans.py::test_bucketed_join_has_no_exchange` proves the plan.

Spark-native bucketing (no Hive needed): the bucket spec lives in the
session catalog; with `path` set the data itself is plain parquet laid out
in bucket files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, path: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """Save ``df`` as a bucketed (optionally sorted) external parquet table."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def colocated_join(spark: SparkSession, left: str, right: str,
                   key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts Catalyst elides both Exchanges; with
    mismatched counts it falls back to a normal shuffle join — the caller
    owns keeping bucket specs aligned (one global constant at deploy time).
    """
    return spark.table(left).join(spark.table(right), key)
