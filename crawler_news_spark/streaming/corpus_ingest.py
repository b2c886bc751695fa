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
     are embedded against the corpus's FROZEN unigram background, blocked
     by banded LSH over their synonym-CLASS sets, and cosine-verified
     against band-colliding members — the existing corpus, every
     previously ABSORBED accepted epoch, and the batch itself
     (within-batch keep-lowest-id) — so paraphrased republications that
     share no shingles (invisible to rung 3) are rejected whether their
     original is old corpus, a prior epoch's accept, or a sibling in the
     same batch, at band-bucket cost that scales with the batch
     (SemanticCrossIndex below; built once, members grow via absorb()).

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


def _class_set_py(text: str) -> set:
    """Distinct synonym-class keys of a doc: per whitespace token, strip
    [.,:] and take min(token, reversed token) — the Python mirror of
    similarity._TBE_CANON_SPARK, the same feature the bow embedding
    hashes.  Empty text yields {''}."""
    table = str.maketrans("", "", ".,:")
    out = set()
    for tok in (text or "").split():
        t = tok.translate(table)
        out.add(min(t, t[::-1]))
    return out or {""}


def _class_sigs_batch(texts) -> "np.ndarray":  # noqa: F821
    """Kirsch-Mitzenmacher min-hash signatures over the synonym-CLASS set
    (dedup._sigs_batch's exact scheme, with unigram classes in place of
    char-5 shingles): (len(texts), N_SIGS) int64."""
    import hashlib

    import numpy as np

    from ..operators.dedup import MH_P, N_SIGS

    out = np.empty((len(texts), N_SIGS), dtype=np.int64)
    I = np.arange(N_SIGS, dtype=np.uint64).reshape(-1, 1)
    P = np.uint64(MH_P)
    for r, text in enumerate(texts):
        cls = _class_set_py(text)
        uv = np.empty((len(cls), 2), dtype=np.uint64)
        for k, s in enumerate(cls):
            hx = hashlib.md5(s.encode()).hexdigest()
            uv[k, 0] = int(hx[:10], 16)
            uv[k, 1] = int(hx[10:20], 16)
        u1 = uv[:, 0] % P
        u2 = uv[:, 1] % P
        out[r] = ((u1[None, :] + I * u2[None, :]) % P).min(axis=1).astype(np.int64)
    return out


class SemanticCrossIndex:
    """Corpus-side state for the incremental SemDeDup rung.

    Built ONCE from the existing corpus: the synonym-class unigram
    background (the centering distribution — incoming docs must be embedded
    in the corpus's space, not their own batch's) and the featurized member
    set (embedding + class-set min-hash signatures per doc).

    Candidate generation is banded LSH over the synonym-CLASS set — the
    same banding machinery as the shingle rung (dedup._band_table), but on
    unigram classes, the very feature the bow embedding hashes.  A
    paraphrase pair (every word swapped for its synonym surface form, order
    destroyed) keeps class-set Jaccard near 1, so its band-collision
    probability is ~1 REGARDLESS of where the pair sits in embedding
    space.  The frozen-k-means cluster blocking this replaces was measured
    unreliable for exactly the docs this rung exists to catch: two
    ~0.99-cosine paraphrases of a NEW story are out-of-distribution for
    centroids trained on the old corpus, their cell scores are flat noise,
    and argmax (even multi-probe) assignment split them on the planted
    fixture.  Candidates are verified with exact cosine >= threshold_u in
    the frozen embedding space — blocking is recall-only, precision comes
    from the verify.  Cost per epoch: one Arrow pass over the batch + a
    band-keyed shuffle join against members — O(batch x bucket), never
    corpus x corpus.

    The EMBEDDING SPACE (background) stays frozen — re-centering per epoch
    would silently shift every vector and make epochs incomparable.  The
    MEMBER set grows: :meth:`absorb` appends a batch's accepted rows
    (lineage-truncated), so later epochs are deduped against earlier
    accepted docs — the same prior-epoch contract as the exact-fingerprint
    rung — and :meth:`drops` adds the within-batch pass (keep-lowest-id,
    batch semantic_dedup's convention), closing ADVICE r07's gap: two
    paraphrases of the same NEW story are no longer both accepted, whether
    they share a batch or not.  Restart note: absorbed members are
    in-memory state; after a restart, re-absorb committed epochs
    (``idx.absorb(read_accepted(spark, out))``) before resuming.
    """

    def __init__(
        self,
        spark,
        existing: DataFrame,
        dim: int = 64,
        threshold_u: int = 750_000,
        rows_per_band: int = 2,
    ) -> None:
        self.dim = dim
        self.threshold_u = threshold_u
        self.rows_per_band = rows_per_band
        self.background = SIM.text_bow_background(existing, dim=dim).persist()
        self.members = self._featurize(existing).persist()

    def _featurize(self, docs: DataFrame) -> DataFrame:
        """(doc_id, e, n, sig0..sig{k-1}): embedding in the frozen space +
        class-set min-hash signatures, one Arrow pass each."""
        from ..operators.dedup import N_SIGS

        emb = SIM.text_bow_embedding(
            docs, dim=self.dim, background=self.background
        ).select(
            "doc_id", SIM._as_double(F.col("embedding")).alias("e")
        ).withColumn("n", SIM._norm(F.col("e")))

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                sigs = _class_sigs_batch(pdf["text"].tolist())
                out = {"doc_id": pdf["doc_id"].values}
                for i in range(N_SIGS):
                    out[f"sig{i}"] = sigs[:, i]
                yield pd.DataFrame(out)

        sigs = docs.select("doc_id", "text").mapInPandas(
            gen,
            "doc_id string, " + ", ".join(f"sig{i} long" for i in range(N_SIGS)),
        )
        return emb.join(sigs, "doc_id")

    def _sig_cols(self, feat: DataFrame) -> DataFrame:
        from ..operators.dedup import N_SIGS

        return feat.select("doc_id", *[f"sig{i}" for i in range(N_SIGS)])

    def _verify(self, pairs: DataFrame, a_feat: DataFrame,
                b_feat: DataFrame) -> DataFrame:
        """Exact-cosine verification of candidate (doc_a, doc_b) pairs in
        the frozen embedding space; keeps pairs >= threshold_u."""
        av = a_feat.select(
            F.col("doc_id").alias("doc_a"),
            F.col("e").alias("ea"),
            F.col("n").alias("na"),
        )
        bv = b_feat.select(
            F.col("doc_id").alias("doc_b"),
            F.col("e").alias("eb"),
            F.col("n").alias("nb"),
        )
        return (
            pairs.join(av, "doc_a")
            .join(bv, "doc_b")
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
            .select("doc_a", "doc_b")
        )

    def cross_drops(self, incoming: DataFrame) -> DataFrame:
        """doc_ids of incoming rows that are semantic duplicates of an
        existing/absorbed member (band collision + cosine >= threshold)."""
        return self._cross_drops_feat(self._featurize(incoming))

    def _cross_drops_feat(self, feat: DataFrame) -> DataFrame:
        pairs = DD.lsh_cross_pairs(
            self._sig_cols(feat),
            self._sig_cols(self.members),
            rows_per_band=self.rows_per_band,
        ).filter(F.col("doc_a") != F.col("doc_b"))
        # the self-pair filter makes a REPLAYED epoch idempotent (ADVICE
        # r08 high): after absorb(), re-running ingest_batch for the same
        # epoch would otherwise band-collide every accepted doc with its
        # own absorbed copy (cosine exactly 1.0) and silently replace the
        # committed epoch directory with a near-empty set.  A doc can never
        # be a semantic duplicate of itself; all other decisions are
        # deterministic, so the epoch-keyed overwrite is exact again.
        return (
            self._verify(pairs, feat, self.members)
            .select(F.col("doc_a").alias("doc_id"))
            .distinct()
        )

    def drops(self, incoming: DataFrame) -> DataFrame:
        """doc_ids to reject: duplicates of an existing/absorbed member
        PLUS the within-batch pass — for each incoming candidate pair
        above threshold the higher id is dropped (keep-lowest-id, the same
        convention as batch semantic_dedup).  Closes ADVICE r07's gap: two
        paraphrases of the same NEW story in one batch are no longer both
        accepted."""
        feat = self._featurize(incoming)
        within_pairs = DD.lsh_candidate_pairs(
            self._sig_cols(feat), rows_per_band=self.rows_per_band
        )
        within = self._verify(within_pairs, feat, feat).select(
            F.col("doc_b").alias("doc_id")
        )
        return self._cross_drops_feat(feat).unionByName(within).distinct()

    def absorb(self, accepted: DataFrame) -> None:
        """Append a batch's ACCEPTED docs to the member set so later epochs
        are semantically deduped against them too (the exact rung's
        prior-epoch contract).  The embedding space stays frozen — only
        members grow.  localCheckpoint truncates the per-epoch union
        lineage (the r07 plan-tree-blowup lesson).  Replay-safe in effect:
        absorbing the same rows twice adds duplicate members, which change
        no drop decision."""
        old = self.members
        self.members = old.unionByName(self._featurize(accepted)).localCheckpoint()
        old.unpersist()

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
            semantic.drops(accepted), "doc_id", "left_anti"
        )

    accepted.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}")
    )

    if semantic is not None:
        # after the epoch committed: absorb what was accepted so the NEXT
        # epoch's semantic rung also rejects paraphrases of it (reread from
        # the committed files — re-deriving through the anti-join lineage
        # would recompute the whole acceptance pipeline)
        semantic.absorb(
            spark.read.parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
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
