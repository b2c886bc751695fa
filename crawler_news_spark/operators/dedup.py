"""Deduplication operator family — exact, keep-first, MinHash+LSH, SimHash.

The reference's only true relational queries are its Mongo duplicate
pipelines (utils/filter_duplicate_record.py:25-62 group/push/match/slice/
unwind/lookup; utils/remove_record_duplicate.py keep-first delete) — mapped
here to groupBy/collect_list/slice/explode and window row_number.  On top,
the near-dup family a training-data pipeline needs: character-shingle
MinHash with banded LSH, true n-gram Jaccard on the LSH candidates, and a
64-bit SimHash (vectorized UDF).

Cross-engine determinism: MinHash uses lexicographic min over
``md5(seed || shingle)`` hex strings — identical in Spark and DuckDB, so the
whole MinHash/LSH/Jaccard pipeline has an exact ANSI-SQL oracle.  All float
outputs are integerized (micro-units) before comparison.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact + keep-first (reference A1/A2)
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: keep the min id per md5(text)."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def keep_first_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """A2 as a window: row_number()==1 keeps the first record per key group
    (idiomatic form of the Mongo slice/delete pipeline)."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def duplicate_groups(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """A1: groups with >1 record -> the duplicate ids (all but the first).

    Mirrors $group/$push/$match/$slice/$unwind
    (filter_duplicate_record.py:25-62); ids sorted so 'first' is
    deterministic (Mongo insertion order -> min id).
    """
    return (
        df.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select(
            *keys,
            F.explode(F.slice("ids", 2, F.col("cnt").cast("int") - 1)).alias("dup_id"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (character shingles)
# ---------------------------------------------------------------------------

N_SIGS = 8
SHINGLE = 5


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct character 5-shingles per doc (explode over positions)."""
    return (
        docs.select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - (SHINGLE - 1), F.lit(1)))
            ).alias("pos"),
            F.col(text_col).alias("_t"),
        )
        .select(id_col, F.expr(f"substring(_t, pos, {SHINGLE})").alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """k lexicographic-min md5 signatures per doc (columns sig0..sig{k-1})."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("shingle")))).alias(f"sig{i}")
        for i in range(N_SIGS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        rows_per_band: int = 2) -> DataFrame:
    """Banded LSH: docs sharing any band hash become candidate pairs (a<b).

    The self-join is keyed on the band value — a shuffle join on a
    high-cardinality key, NOT an O(n^2) cross join.
    """
    n_bands = N_SIGS // rows_per_band
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
                            )
                        ).alias("bhash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """True shingle-Jaccard for candidate pairs, micro-unit integerized."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh.select(F.col(id_col).alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col(id_col).alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard_u",
            F.floor(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
                * 1e6
                + F.lit(0.5)
            ).cast("long"),
        )
        .select("doc_a", "doc_b", "n_inter", "jaccard_u")
    )
    return out


def sig_estimate_prune(pairs: DataFrame, sigs: DataFrame, id_col: str = "doc_id",
                       min_matches: int = 2) -> DataFrame:
    """Prune LSH candidates by the MinHash Jaccard *estimate* (matching
    signature count) before the expensive exact-Jaccard shingle join.

    The estimate is a column comparison on the small signature table — on a
    shared-vocabulary corpus the banded LSH emits many low-similarity
    candidates, and the shingle join is |pairs| x |shingles/doc| rows; this
    cuts it by ~an order of magnitude.  Deterministic, so the DuckDB oracle
    applies the identical rule.
    """
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"sig{i}").alias(f"a{i}") for i in range(N_SIGS)]
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"sig{i}").alias(f"b{i}") for i in range(N_SIGS)]
    )
    est = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(N_SIGS)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_matches", est)
        .filter(F.col("est_matches") >= min_matches)
        .select("doc_a", "doc_b")
    )


def minhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold_u: int = 500_000,
                      min_sig_matches: int = 3) -> DataFrame:
    """Full pipeline: shingles -> signatures -> LSH pairs -> estimate prune
    -> exact Jaccard filter."""
    sh = shingles(docs, text_col, id_col).cache()
    sigs = minhash_signatures(sh, id_col)
    pairs = lsh_candidate_pairs(sigs, id_col)
    pruned = sig_estimate_prune(pairs, sigs, id_col, min_sig_matches)
    jac = jaccard_on_pairs(pruned, sh, id_col)
    return jac.filter(F.col("jaccard_u") >= threshold_u)


# ---------------------------------------------------------------------------
# SimHash (vectorized UDF — no SQL twin; pytest-verified vs pure Python)
# ---------------------------------------------------------------------------


def simhash_py(text: str) -> int:
    """64-bit SimHash over whitespace tokens, md5-derived token hashes."""
    import hashlib

    acc = [0] * 64
    for tok in text.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_col(text_col: str = "text"):
    """Arrow-batched SimHash (pandas_udf over string series)."""

    @F.pandas_udf("long")
    def _simhash(s: pd.Series) -> pd.Series:
        return s.map(simhash_py)

    return _simhash(F.col(text_col))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 8) -> DataFrame:
    """SimHash near-dups: band the 64-bit hash into 4x16-bit keys; a pair
    within hamming<=max_hamming shares at least one exact band w.h.p."""
    withsh = docs.select(id_col, simhash_col(text_col).alias("simhash"))
    bands = withsh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, ["band", "bkey"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs
