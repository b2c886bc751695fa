"""semantic_dedup (SemDeDup-style embedding-cluster dedup) — independent
pure-Python recount of the whole operator (quantize, md5-pivot k-means,
argmax assignment, cluster-local pairwise cosine, keep-lowest-id), plus
structural invariants on the planted fixture.

The recount deliberately mirrors the ENGINE's arithmetic conventions
(left-to-right fold sums like F.aggregate, floor(x*1e6+0.5) micro-units,
floor-division centroid updates) so any drift in the Spark plan shows up as
a set mismatch, not an ulp flake.
"""

import hashlib
import math

import pytest

from crawler_news_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


def _fold_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _fold_norm(a):
    s = 0.0
    for x in a:
        s += x * x
    return math.sqrt(s)


def _python_semantic_dedup(rows, threshold_u, n_clusters=16, n_iter=2):
    """(vec_id, cluster) kept set, recomputed without Spark or DuckDB."""
    ids = sorted(rows)
    quant = {i: [math.floor(x * 1e6 + 0.5) for x in rows[i]] for i in ids}

    piv = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cent = [list(quant[i]) for i in piv[:n_clusters]]

    def assign(v):
        dots = [sum(x * y for x, y in zip(v, c)) for c in cent]
        return dots.index(max(dots))  # ties -> lowest cluster, like argmax

    for _ in range(n_iter):
        sums = {}
        counts = {}
        for i in ids:
            j = assign(quant[i])
            counts[j] = counts.get(j, 0) + 1
            acc = sums.setdefault(j, [0] * len(quant[i]))
            for d, x in enumerate(quant[i]):
                acc[d] += x
        for j, acc in sums.items():
            cent[j] = [s // counts[j] for s in acc]  # floor division, like _fdiv

    clusters = {i: assign(quant[i]) for i in ids}

    by_cluster = {}
    for i in ids:
        by_cluster.setdefault(clusters[i], []).append(i)
    norms = {i: _fold_norm(rows[i]) for i in ids}
    dropped = set()
    for members in by_cluster.values():
        for ai, a in enumerate(members):
            for b in members[ai + 1 :]:
                sim_u = math.floor(
                    _fold_dot(rows[a], rows[b]) / (norms[a] * norms[b]) * 1e6 + 0.5
                )
                if sim_u >= threshold_u:
                    dropped.add(b)
    return {(i, clusters[i]) for i in ids if i not in dropped}


@pytest.fixture(scope="module")
def planted_rows(spark):
    emb = SIM.planted_embeddings(spark.read.parquet(f"{SF}/embeddings.parquet"))
    return {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}


def test_semantic_dedup_matches_python_recount(spark, planted_rows):
    emb = SIM.planted_embeddings(spark.read.parquet(f"{SF}/embeddings.parquet"))
    got = {
        (r["vec_id"], r["cluster"])
        for r in SIM.semantic_dedup(emb, threshold_u=900_000).collect()
    }
    want = _python_semantic_dedup(planted_rows, threshold_u=900_000)
    assert got == want


def test_semantic_dedup_drops_planted_twins(spark):
    """Exact twins share their base's vector, hence its cluster, hence are
    always the dropped (higher-id) side; the planted fixture guarantees the
    operator bites."""
    emb = SIM.planted_embeddings(spark.read.parquet(f"{SF}/embeddings.parquet"))
    kept = {r["vec_id"] for r in SIM.semantic_dedup(emb, threshold_u=900_000).collect()}
    twin_ids = {r for r in kept if r >= 1_000_000}
    base = [r for r in kept if r < 1_000_000 and r % 50 == 7]
    assert not twin_ids  # every planted copy (exact AND perturbed) removed
    assert base  # their low-id originals survive
    assert len(kept) < 520  # strictly fewer than the planted corpus


def test_semantic_dedup_threshold_monotone(spark, planted_rows):
    """Raising the threshold can only keep MORE rows (fewer pairs qualify)."""
    emb = SIM.planted_embeddings(spark.read.parquet(f"{SF}/embeddings.parquet"))
    lo = SIM.semantic_dedup(emb, threshold_u=900_000).count()
    hi = SIM.semantic_dedup(emb, threshold_u=1_000_000).count()
    assert hi >= lo


def test_tbe_canon_spark_duckdb_parity_multi_punct(spark):
    """ADVICE r07 (medium): the synonym-class canonicalization must be
    GLOBAL in both engines.  DuckDB's regexp_replace without 'g' replaces
    only the first match, so the old shared expression diverged on any
    token with >=2 of [.,:] ('16:30.' -> '1630.' vs Spark's '1630') and the
    semantic-dedup twin silently hashed such tokens to different synonym
    classes.  translate() is per-character and global in both engines; this
    pins byte-identical canon output on multi-punct tokens."""
    import duckdb

    toks = ["16:30.", "a.b.c", "x,,y::z", "plain", ".,:", "nv."]
    canon_spark = SIM._TBE_CANON_SPARK.format(t="tok")
    canon_sql = SIM._TBE_CANON_SQL.format(t="tok")
    got_spark = [
        r["c"]
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .selectExpr(f"{canon_spark} as c")
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {canon_sql} FROM (SELECT ? AS tok)", [t]).fetchone()[0]
        for t in toks
    ]
    assert got_spark == got_duck
    # and the punctuation strip really is global
    assert got_spark[0] == "0361"  # least('1630', reverse('1630'))
