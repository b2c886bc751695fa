"""Export sinks.

The reference writes each article to a single overwritten crawl_result.json
(service_utils.py:76-83 — a last-writer-wins race across threads we do NOT
replicate) and inserts into MongoDB (mongodb_utils.py:40-59).  The engine's
canonical store is the wave-snapshot catalog; these helpers export it to
line-delimited JSON / parquet for downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_json(df: DataFrame, outdir: str, parts: int | None = None) -> None:
    if parts is not None:
        df = df.coalesce(parts)
    df.write.mode("overwrite").json(outdir)


def export_parquet(df: DataFrame, outdir: str, parts: int | None = None) -> None:
    if parts is not None:
        df = df.coalesce(parts)
    df.write.mode("overwrite").parquet(outdir)
