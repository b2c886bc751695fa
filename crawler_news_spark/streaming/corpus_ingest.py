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
     existing corpus is never self-joined, cost scales with the batch);
  4. optionally, the SEMANTIC rung (incremental SemDeDup): incoming docs
     are embedded against the corpus's FROZEN unigram background,
     cluster-assigned against its FROZEN k-means centroids, and cosine-
     compared with existing members of the SAME cluster only — paraphrased
     republications that share no shingles (invisible to rung 3) are
     rejected, at cluster-local cost that scales with the batch
     (SemanticCrossIndex below; built once, reused across every epoch).

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
from ..operators import similarity as SIM

DOC_SCHEMA = "doc_id string, text string"


class SemanticCrossIndex:
    """Frozen corpus-side state for the incremental SemDeDup rung.

    Built ONCE from the existing corpus: the synonym-class unigram
    background (the centering distribution — incoming docs must be embedded
    in the corpus's space, not their own batch's), the deterministic integer
    k-means centroids (the same coarse quantizer semantic_dedup/ivf_topk
    use), and the cluster-assigned member vectors.  Per epoch, only the
    incoming docs are embedded and assigned — one Arrow pass over the batch
    — and compared against same-cluster members: O(batch x cluster size),
    never corpus x corpus.
    """

    def __init__(
        self,
        spark,
        existing: DataFrame,
        dim: int = 64,
        n_clusters: int = 16,
        n_iter: int = 2,
        threshold_u: int = 750_000,
    ) -> None:
        self.dim = dim
        self.threshold_u = threshold_u
        self.background = SIM.text_bow_background(existing, dim=dim).persist()
        emb = SIM.text_bow_embedding(
            existing, dim=dim, background=self.background
        ).select(F.col("doc_id"), F.col("embedding"))
        q = emb.select(
            "doc_id", SIM._as_double(F.col("embedding")).alias("e")
        ).withColumn("q", SIM._quantize(F.col("e")))
        self.centroids = SIM._kmeans_centroids(q, n_clusters, n_iter, "doc_id")
        self.members = (
            SIM._assign_clusters(q, self.centroids, "doc_id")
            .select(
                F.col("doc_id").alias("id_b"),
                F.col("e").alias("eb"),
                "cluster",
            )
            .withColumn("nb", SIM._norm(F.col("eb")))
            .persist()
        )

    def cross_drops(self, incoming: DataFrame) -> DataFrame:
        """doc_ids of incoming rows that are semantic duplicates of an
        existing member (cosine >= threshold within the assigned cluster)."""
        emb = SIM.text_bow_embedding(
            incoming, dim=self.dim, background=self.background
        )
        q = emb.select(
            "doc_id", SIM._as_double(F.col("embedding")).alias("e")
        ).withColumn("q", SIM._quantize(F.col("e")))
        a = SIM._assign_clusters(q, self.centroids, "doc_id").select(
            F.col("doc_id").alias("id_a"), F.col("e").alias("ea"), "cluster"
        ).withColumn("na", SIM._norm(F.col("ea")))
        return (
            a.join(self.members, "cluster")
            .withColumn(
                "sim_u",
                F.floor(
                    SIM._dot(F.col("ea"), F.col("eb"))
                    / (F.col("na") * F.col("nb"))
                    * 1e6
                    + F.lit(0.5)
                ).cast("long"),
            )
            .filter(F.col("sim_u") >= self.threshold_u)
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
        )

    def unpersist(self) -> None:
        self.background.unpersist()
        self.members.unpersist()


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
    semantic: SemanticCrossIndex | None = None,
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

    if semantic is not None:
        accepted = accepted.join(
            semantic.cross_drops(accepted), "doc_id", "left_anti"
        )

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
    semantic: SemanticCrossIndex | None = None,
):
    """File-source streaming ingest; exactly-once accepted-doc appends via
    epoch-keyed overwrite (see module docstring)."""
    stream = spark.readStream.schema(DOC_SCHEMA).json(doc_dir)

    def batch_fn(df: DataFrame, epoch_id: int):
        ingest_batch(
            spark, df, existing, out_dir, epoch_id, threshold_u, semantic
        )

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
