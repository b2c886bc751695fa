"""Streaming incremental corpus ingest — the daily-refresh deployment shape
of the batch ``corpus_update`` pipeline (queries.py corpus_update_stages).

A stream of new documents ``{doc_id, text}`` arrives in micro-batches (file
source in tests; kafka in production).  Each batch runs the SAME acceptance
pipeline as the batch job:

  1. within-batch exact dedup (keep min doc_id per md5 body);
  2. exact-fingerprint anti-join against the EXISTING corpus *plus every
     previously accepted batch* — the skinny 32-byte-hash side of the join;
  3. banded cross-LSH near-dup rejection against the EXISTING corpus only
     (operators/dedup.py minhash_cross_near_dups: new x old bands — the
     existing corpus is never self-joined, cost scales with the batch).

Accepted rows are appended to an output directory KEYED ON THE EPOCH
(``epoch={id}/``, overwrite mode) — foreachBatch is at-least-once, and the
epoch-keyed overwrite makes the append idempotent: a replayed batch
overwrites its own partial output instead of duplicating (the same
write-a-slot contract as CrawlCatalog.write).  Step 2 reads only epochs
STRICTLY BELOW the current one with a _SUCCESS marker, so a crashed
attempt's partial files are never treated as accepted state.

Ordering note (stream vs batch): the batch job dedups the whole day's
intake at once, keeping the MIN doc_id of each exact group; the stream
keeps the EARLIEST ARRIVAL.  Accepted CONTENT (the set of body
fingerprints) is identical regardless of how the day is micro-batched;
representative doc_ids coincide whenever each exact group arrives
min-id-first (tests pin both properties).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as DD

DOC_SCHEMA = "doc_id string, text string"


def _exact_keep_min(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("_ch", F.md5("text"))
        .groupBy("_ch")
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
    )


def _committed_epoch_dirs(out_dir: str, below_epoch: int) -> list[str]:
    """Accepted-state dirs from epochs < below_epoch that finished their
    write (_SUCCESS) — replayed/crashed partials are invisible."""
    if not os.path.isdir(out_dir):
        return []
    dirs = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        try:
            ep = int(d.split("=", 1)[1])
        except ValueError:
            continue
        p = os.path.join(out_dir, d)
        if ep < below_epoch and os.path.exists(os.path.join(p, "_SUCCESS")):
            dirs.append(p)
    return dirs


def ingest_batch(
    spark,
    batch: DataFrame,
    existing: DataFrame,
    out_dir: str,
    epoch_id: int,
    threshold_u: int = 400_000,
) -> None:
    """One micro-batch of the incremental ingest (the foreachBatch body)."""
    b1 = _exact_keep_min(batch)

    # fingerprints of everything already in the corpus: the existing corpus
    # plus every committed prior epoch.  Only (32-byte hash) columns travel.
    fps = existing.select(F.md5("text").alias("_ch"))
    prior = _committed_epoch_dirs(out_dir, epoch_id)
    if prior:
        accepted_prior = spark.read.parquet(*prior)
        fps = fps.unionByName(accepted_prior.select(F.md5("text").alias("_ch")))
    b2 = (
        b1.withColumn("_ch", F.md5("text"))
        .join(fps, "_ch", "left_anti")
        .select("doc_id", "text")
    )

    cross = DD.minhash_cross_near_dups(b2, existing, threshold_u=threshold_u)
    near_drops = cross.select(F.col("doc_a").alias("doc_id")).distinct()
    accepted = b2.join(near_drops, "doc_id", "left_anti")

    accepted.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}")
    )


def run_corpus_ingest_stream(
    spark,
    doc_dir: str,
    existing: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold_u: int = 400_000,
):
    """File-source streaming ingest; exactly-once accepted-doc appends via
    epoch-keyed overwrite (see module docstring)."""
    stream = spark.readStream.schema(DOC_SCHEMA).json(doc_dir)

    def batch_fn(df: DataFrame, epoch_id: int):
        ingest_batch(spark, df, existing, out_dir, epoch_id, threshold_u)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_accepted(spark, out_dir: str) -> DataFrame | None:
    """All committed accepted docs across epochs (None before any commit)."""
    dirs = _committed_epoch_dirs(out_dir, 1 << 62)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)
