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
#
# Scale design (the 100 TB path): signatures are computed in ONE vectorized
# Arrow pass per document — numpy sliding-window polynomial hashing over
# codepoints, then k affine min-hash transforms.  Nothing is exploded and
# nothing shuffles until the (tiny) signature table hits the banded LSH
# self-join.  Candidate pairs are verified with an exact shingle-set Jaccard
# vUDF over the two joined texts — |pairs| rows, not |pairs| x |shingles|.
#
# Cross-engine determinism: the shingle hash is Kirsch-Mitzenmacher double
# hashing over md5 — u1/u2 are the first two 40-bit halves of md5(shingle),
# sig_i = min over distinct shingles of (u1 + i*u2) mod prime P.  md5 is
# identical everywhere; the hex halves are CAST('0x…' AS BIGINT) in DuckDB,
# so the whole MinHash/LSH/Jaccard pipeline has an exact ANSI-SQL oracle.
# (A structured polynomial base hash was tried first: its lack of min-wise
# independence inflated band collisions ~2.5x vs md5 on a shared-vocabulary
# corpus — overlapping windows correlate any Horner-style hash.)
# ---------------------------------------------------------------------------

N_SIGS = 8
SHINGLE = 5
MH_P = 4_294_967_291  # largest 32-bit prime


def shingle_set_py(text: str) -> set:
    """Distinct 5-char windows; substr(text, i, 5) semantics (a doc shorter
    than 5 chars yields one short shingle; empty text yields {''})."""
    n = max(len(text) - (SHINGLE - 1), 1)
    return {text[i : i + SHINGLE] for i in range(n)}


def shingle_uv_py(s: str) -> tuple[int, int]:
    """(u1, u2) = first two 10-hex-digit halves of md5(shingle), mod P."""
    import hashlib

    hx = hashlib.md5(s.encode()).hexdigest()
    return int(hx[:10], 16) % MH_P, int(hx[10:20], 16) % MH_P


def minhash_sigs_py(text: str) -> list[int]:
    """Pure-Python spec: k Kirsch-Mitzenmacher min-hashes over the distinct
    shingle set.  i*u2 <= 7*(P-1) < 2^35, so everything fits signed 64-bit
    in both engines."""
    uv = [shingle_uv_py(s) for s in shingle_set_py(text)]
    return [min((u1 + i * u2) % MH_P for u1, u2 in uv) for i in range(N_SIGS)]


def _sigs_batch(texts) -> "np.ndarray":  # noqa: F821
    """Vectorized minhash_sigs_py over a batch: (len(texts), N_SIGS).

    md5 once per distinct shingle per doc (the only Python-loop cost,
    ~0.2 ms/doc); the k transforms + min are numpy."""
    import hashlib

    import numpy as np

    out = np.empty((len(texts), N_SIGS), dtype=np.int64)
    I = np.arange(N_SIGS, dtype=np.uint64).reshape(-1, 1)
    P = np.uint64(MH_P)
    for r, text in enumerate(texts):
        t = text or ""
        n = max(len(t) - (SHINGLE - 1), 1)
        shs = {t[i : i + SHINGLE] for i in range(n)}
        uv = np.empty((len(shs), 2), dtype=np.uint64)
        for k, s in enumerate(shs):
            hx = hashlib.md5(s.encode()).hexdigest()
            uv[k, 0] = int(hx[:10], 16)
            uv[k, 1] = int(hx[10:20], 16)
        u1 = uv[:, 0] % P
        u2 = uv[:, 1] % P
        out[r] = ((u1[None, :] + I * u2[None, :]) % P).min(axis=1).astype(np.int64)
    return out


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", spread: bool = True) -> DataFrame:
    """k min-hash signatures per doc (long columns sig0..sig{k-1}).

    One mapInPandas pass: the scale path.  Output is exactly
    minhash_sigs_py per row (pytest) and the DuckDB Horner oracle (gate).

    ``spread`` repartitions the narrow (id, text) projection to the session's
    default parallelism first: a single parquet split (or an AQE-coalesced
    byte-small input) would otherwise run the whole vUDF on 1-2 tasks.  On a
    cluster whose scan already yields >= cores splits this is one extra
    round-robin shuffle of the projected columns — drop it with spread=False.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    id_field = docs.schema[id_col]
    schema = StructType(
        [StructField(id_col, id_field.dataType)]
        + [StructField(f"sig{i}", LongType()) for i in range(N_SIGS)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = _sigs_batch(pdf[text_col].tolist())
            out = {id_col: pdf[id_col].values}
            for i in range(N_SIGS):
                out[f"sig{i}"] = sigs[:, i]
            yield pd.DataFrame(out)

    narrow = docs.select(id_col, text_col)
    if spread:
        narrow = narrow.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return narrow.mapInPandas(gen, schema)


def _band_table(sigs: DataFrame, id_col: str,
                rows_per_band: int) -> tuple[DataFrame, list[str]]:
    """(id, band, v0..v{r-1}) — one row per LSH band per document."""
    if N_SIGS % rows_per_band:
        raise ValueError(f"rows_per_band={rows_per_band} must divide N_SIGS={N_SIGS}")
    n_bands = N_SIGS // rows_per_band
    vcols = [f"v{j}" for j in range(rows_per_band)]
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col(f"sig{b * rows_per_band + j}").alias(f"v{j}")
                            for j in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", *[f"bb.{v}" for v in vcols])
    return bands, vcols


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        rows_per_band: int = 2) -> DataFrame:
    """Banded LSH: docs sharing any band (all ``rows_per_band`` raw sig
    values) become candidate pairs (a<b).

    The self-join is keyed on (band, v0..v{r-1}) — a shuffle join on a
    high-cardinality key, NOT an O(n^2) cross join.  Band keys are the raw
    long signatures (every signature in the band participates — the LSH
    band probability s^r depends on it); no re-hash needed.
    """
    bands, vcols = _band_table(sigs, id_col, rows_per_band)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", *vcols])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def lsh_cross_pairs(sigs_new: DataFrame, sigs_old: DataFrame,
                    id_col: str = "doc_id",
                    rows_per_band: int = 2) -> DataFrame:
    """Banded LSH between a NEW batch and an EXISTING corpus — the
    incremental-ingest shape (daily corpus refresh): candidates are
    (doc_a=new, doc_b=old) pairs sharing any band.  Same high-cardinality
    shuffle join as the self-join; the existing corpus is never
    self-joined, so the cost scales with the BATCH, not the corpus."""
    ba, vcols = _band_table(sigs_new, id_col, rows_per_band)
    bb, _ = _band_table(sigs_old, id_col, rows_per_band)
    return (
        ba.alias("a").join(bb.alias("b"), ["band", *vcols])
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_cross_near_dups(new_docs: DataFrame, old_docs: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            threshold_u: int = 500_000,
                            min_sig_matches: int = 3) -> DataFrame:
    """Near-dups of a new batch AGAINST an existing corpus: signatures for
    both sides, banded cross-LSH, estimate prune, exact-Jaccard verify.
    Returns (doc_a=new, doc_b=old, n_inter, jaccard_u) at >= threshold.

    The prune/verify stages are the self-join pipeline's, fed a union of
    the two (disjoint-id) sides — candidates are only ever new x old."""
    from . import _cache

    sigs_new = _cache.claim(
        "minhash_cross.sigs_new", minhash_signatures(new_docs, text_col, id_col)
    )
    sigs_old = _cache.claim(
        "minhash_cross.sigs_old", minhash_signatures(old_docs, text_col, id_col)
    )
    pairs = lsh_cross_pairs(sigs_new, sigs_old, id_col)
    all_sigs = sigs_new.unionByName(sigs_old)
    pruned = sig_estimate_prune(pairs, all_sigs, id_col, min_sig_matches)
    all_docs = new_docs.select(id_col, text_col).unionByName(
        old_docs.select(id_col, text_col)
    )
    jac = exact_jaccard_on_pairs(pruned, all_docs, text_col, id_col)
    return jac.filter(F.col("jaccard_u") >= threshold_u)


def sig_estimate_prune(pairs: DataFrame, sigs: DataFrame, id_col: str = "doc_id",
                       min_matches: int = 3) -> DataFrame:
    """Prune LSH candidates by the MinHash Jaccard *estimate* (matching
    signature count) before fetching texts for the exact verify.

    On a shared-vocabulary corpus the banded LSH emits many low-similarity
    candidates; this column compare on the skinny signature table cuts the
    verify set (and the two text joins feeding it) by ~10x.  Deterministic,
    so the DuckDB oracle applies the identical rule.
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


def jaccard_py(text_a: str, text_b: str) -> tuple[int, int]:
    """Exact distinct-5-shingle Jaccard spec: (n_inter, jaccard_u)."""
    import math

    def sset(t: str) -> set:
        n = max(len(t) - (SHINGLE - 1), 1)
        return {t[i : i + SHINGLE] for i in range(n)}

    a, b = sset(text_a or ""), sset(text_b or "")
    n_inter = len(a & b)
    union = len(a) + len(b) - n_inter
    return n_inter, int(math.floor(n_inter * 1e6 / union + 0.5))


def exact_jaccard_on_pairs(pairs: DataFrame, docs: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard per candidate pair via an Arrow vUDF.

    Texts reach the pair via two hash joins (candidates << corpus at scale);
    the set intersection is O(len_a + len_b) per pair inside one Python
    batch — no |pairs| x |shingles/doc| explode-join.
    """
    j = (
        pairs.join(
            docs.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("_ta")),
            "doc_a",
        )
        .join(
            docs.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("_tb")),
            "doc_b",
        )
    )

    @F.pandas_udf("struct<n_inter:long, jaccard_u:long>")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        rows = [jaccard_py(x, y) for x, y in zip(ta, tb)]
        return pd.DataFrame(rows, columns=["n_inter", "jaccard_u"])

    return (
        j.withColumn("_j", _jac(F.col("_ta"), F.col("_tb")))
        .select("doc_a", "doc_b", F.col("_j.n_inter").alias("n_inter"),
                F.col("_j.jaccard_u").alias("jaccard_u"))
    )


def minhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold_u: int = 500_000,
                      min_sig_matches: int = 3) -> DataFrame:
    """Full pipeline: vUDF signatures -> banded LSH pairs -> estimate prune
    -> exact-Jaccard verify (per-pair vUDF) -> threshold filter.

    The signature table is persisted: the band self-join reads it twice and
    the prune twice more — without a persist the signature vUDF subtree
    re-executes ~5x.  At scale it is n_docs x (id + 8 longs), far smaller
    than the corpus, and the natural thing to materialize anyway.  The
    persist lives in a named cache slot so a repeat invocation releases the
    previous generation instead of accumulating executor storage.
    """
    from . import _cache

    sigs = _cache.claim("minhash_near_dups.sigs", minhash_signatures(docs, text_col, id_col))
    pairs = lsh_candidate_pairs(sigs, id_col)
    pruned = _cache.claim(
        "minhash_near_dups.pruned", sig_estimate_prune(pairs, sigs, id_col, min_sig_matches)
    )
    jac = exact_jaccard_on_pairs(pruned, docs, text_col, id_col)
    return jac.filter(F.col("jaccard_u") >= threshold_u)


def connected_components(edges: DataFrame, max_iter: int = 25,
                         rounds_out: list | None = None) -> DataFrame:
    """Connected components over an undirected edge list (doc_a, doc_b) by
    min-label propagation with pointer doubling — the fuzzy-dedup CLUSTERING
    step: near-dup pairs become groups, and the group representative is the
    minimum member id.

    Returns (id, component_id) for every node appearing in an edge.

    Iterative join-based propagation, the idiomatic Spark shape: each round
    every node takes

        min(own label, neighbors' labels, label OF its own label)

    The third term is the pointer-doubling shortcut (the label-contraction
    step of Kiveris et al.'s large-star/small-star family): a node whose
    label is k rounds stale jumps straight to k-fresh information, so the
    longest label chain HALVES each round and convergence is O(log
    diameter) rounds instead of O(diameter) — a planted path graph of 300
    nodes converges in ~9 rounds, not 300 (tests/test_dedup_similarity.py).
    Every label is always the id of some node in the same component (labels
    only ever flow along edges), so the shortcut join hits and the fixpoint
    is unchanged: no-change under shortcutted propagation implies no-change
    under plain propagation, whose unique fixpoint is the component min.

    Convergence is detected by a change-count (one 1-row collect per round).
    Each round's labels are persisted and the previous generation released;
    ``localCheckpoint`` truncates the logical plan so the lineage does not
    grow with iterations (on a cluster with an HDFS checkpoint dir,
    ``checkpoint`` is the fault-tolerant swap-in).  The symmetrized edge
    list is checkpointed ONCE before the loop — it is read by every round's
    join, and without materialization the upstream pair-generation plan
    (e.g. minhash_near_dups' exact-Jaccard verify) would re-execute each
    round.  Deterministic — min is order-insensitive — so the DuckDB twin
    is a recursive CTE computing the min reachable id per node.

    ``rounds_out``: optional list; the number of propagation rounds is
    appended (bench/tests instrumentation).
    """
    sym = edges.select("doc_a", "doc_b").unionByName(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint()
    try:
        labels = (
            sym.select(F.col("doc_a").alias("id")).distinct()
            .withColumn("lab", F.col("id"))
            .localCheckpoint()
        )
        for rounds in range(1, max_iter + 1):
            nbr = (
                sym.join(
                    labels.select(F.col("id").alias("doc_b"), "lab"), "doc_b"
                )
                .groupBy("doc_a")
                .agg(F.min("lab").alias("nlab"))
                .withColumnRenamed("doc_a", "id")
            )
            # pointer doubling: lab(lab(id)) — every lab value is a node id,
            # so the self-join always finds a row (left join is belt-and-
            # braces for the init round).
            hop = labels.select(
                F.col("id").alias("lab"), F.col("lab").alias("lab2")
            )
            new = (
                labels.join(nbr, "id", "left")
                .join(hop, "lab", "left")
                .select(
                    "id",
                    F.least(
                        F.col("lab"),
                        F.coalesce("nlab", "lab"),
                        F.coalesce("lab2", "lab"),
                    ).alias("new_lab"),
                    F.col("lab").alias("_old"),
                )
                .select(
                    "id",
                    F.col("new_lab").alias("lab"),
                    (F.col("new_lab") < F.col("_old")).cast("int").alias("_chg"),
                )
            )
            new = new.localCheckpoint()
            changed = new.agg(F.sum("_chg")).collect()[0][0] or 0
            new = new.drop("_chg")
            labels.unpersist()
            labels = new
            if changed == 0:
                if rounds_out is not None:
                    rounds_out.append(rounds)
                return labels.select("id", F.col("lab").alias("component_id"))
        raise ValueError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        sym.unpersist()


# ---------------------------------------------------------------------------
# SimHash (vectorized UDF; exact ANSI-SQL twin in queries.py — md5 halves,
# 64 signed-majority bit sums, band keys rebuilt from sign bits)
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


def _simhash_batch(texts) -> "np.ndarray":  # noqa: F821
    """numpy-batched simhash_py: md5 only per *unique* token in the batch,
    bit unpack + ±1 accumulation fully vectorized (no per-bit Python loop).
    """
    import hashlib

    import numpy as np

    tok_lists = [(t or "").split() for t in texts]
    counts = np.array([len(x) for x in tok_lists], dtype=np.int64)
    total = int(counts.sum())
    out = np.zeros(len(texts), dtype=np.int64)
    if total == 0:
        return out

    # md5 once per *distinct* token (dict cache — vocab repeats heavily)
    cache: dict[str, int] = {}

    def h_of(tok: str) -> int:
        v = cache.get(tok)
        if v is None:
            v = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            cache[tok] = v
        return v

    hs = np.fromiter(
        (h_of(t) for lst in tok_lists for t in lst), dtype=np.uint64, count=total
    ).astype("<u8", copy=False)  # pin little-endian for the byte view below
    # bit-unpack: little-endian byte view + bitorder='little' puts bit b of
    # the uint64 at column b — no 64-iteration Python loop, no (T,64) uint64
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(total, 8), axis=1, bitorder="little"
    ).astype(np.int32)  # (T, 64) in {0,1}
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nonempty = counts > 0
    # reduceat misreads zero-length segments; accumulate only non-empty docs
    # (starts of consecutive non-empty docs are the true segment bounds —
    # empty docs contribute zero tokens between them)
    ones = np.add.reduceat(bits, starts[nonempty], axis=0)  # (D', 64)
    # acc = (+1 per one-bit, -1 per zero-bit) = 2*ones - n_tokens; acc > 0
    sign_bits = (2 * ones > counts[nonempty, None]).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    packed = (sign_bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed.view(np.int64)
    return out


def simhash_col(text_col: str = "text"):
    """Arrow-batched SimHash (vectorized pandas_udf; spec = simhash_py)."""

    @F.pandas_udf("long")
    def _simhash(s: pd.Series) -> pd.Series:
        return pd.Series(_simhash_batch(s.tolist()))

    return _simhash(F.col(text_col))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 8) -> DataFrame:
    """SimHash near-dups: band the 64-bit hash into 4x16-bit keys; a pair
    within hamming<=max_hamming shares at least one exact band w.h.p.

    The hash pass is spread to default parallelism first (same single-split
    input trap as minhash_signatures)."""
    spread = docs.select(id_col, F.col(text_col)).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # persisted (named slot — re-invocation releases the old generation):
    # the band self-join reads the hash table twice; without it the hash
    # vUDF re-executes per side (n_docs x 16 bytes — tiny)
    from . import _cache

    withsh = _cache.claim(
        "simhash_near_dups.hashes",
        spread.select(id_col, simhash_col(text_col).alias("simhash")),
    )
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


# ---------------------------------------------------------------------------
# C4-style line-level dedup (reference has no line ops; this is the
# training-pipeline extension — Raffel et al. 2020 §2.2's occurring-span
# dedup at line granularity)
# ---------------------------------------------------------------------------


def line_dedup_docs(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    digest_keys: bool = False) -> DataFrame:
    """C4-style corpus-wide line dedup: split each document on '\\n'; every
    duplicated line survives only at its FIRST (doc_id, idx) occurrence.

    Returns (doc_id, n_kept, n_dropped, clean_hash) where clean_hash is the
    md5 of the reassembled surviving text.

    Scale shape: ONE window partitioned by the line — group size is that
    line's duplication count, bounded by corpus duplication, never corpus
    size — plus one hash aggregate to reassemble.

    ``digest_keys`` is the petabyte knob: partition the window on
    md5(line) (128-bit digest) instead of the raw line, so the shuffle
    carries fixed-width 32-byte keys instead of arbitrarily long line text
    in the KEY position (the line still rides along as a value column for
    reassembly).  Result-identical to the raw-line plan unless two distinct
    lines collide under md5 — negligible (~2^-64 birthday bound) at any
    real corpus size; the raw-line default keeps the DuckDB oracle twin
    collision-proof by construction.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    part = F.md5("line") if digest_keys else F.col("line")
    w = Window.partitionBy(part).orderBy("doc_id", "idx")
    flagged = lines.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("keep").cast("long").alias("n_kept"),
        (F.count("*") - F.sum("keep")).cast("long").alias("n_dropped"),
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep") == 1, F.struct("idx", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
            )
        ).alias("clean_hash"),
    )
