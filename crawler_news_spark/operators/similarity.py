"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k, built-in expressions only
  (zip_with/aggregate dot product): the correctness baseline, with an exact
  DuckDB oracle (list_cosine_similarity).
- :func:`lsh_bucket_topk` — random-hyperplane LSH variant: the scale path.
  Plane matrix is a small deterministic numpy array broadcast to executors;
  sign-bit bucketing happens in one Arrow-batched pass, then only same-bucket
  (or neighboring-bucket) pairs are scored.  Recall vs brute force is
  pytest-verified.
- :func:`embedding_near_dups` — near-duplicate pairs above a cosine
  threshold via the same LSH bucketing.

All cosine outputs are micro-unit integerized for cross-engine comparison.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_sim_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` ids (broadcast side).

    The query side is tiny -> broadcast hash join, no shuffle of the corpus;
    the corpus scan + dot products stay in whole-stage codegen.
    """
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qe")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_u",
            F.floor(cosine_sim_col(F.col("qe"), F.col("ce")) * 1e6 + F.lit(0.5)).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_u")
    )


def sql_cosine_topk(n_queries: int = 5, k: int = 10) -> str:
    """DuckDB oracle for :func:`cosine_topk`."""
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id < {n_queries}
        ), scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 CAST(floor(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) * 1e6 + 0.5) AS BIGINT) AS sim_u
          FROM q, embeddings e WHERE e.vec_id <> q.query_id
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_u DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim_u
        FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the 100 TB path
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def add_lsh_bucket(
    emb: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit bucket per vector: one Arrow-batched matmul pass."""
    p = planes  # closure-captured; small (n_planes x dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            bits = (m @ p.T) > 0
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for i in range(p.shape[0]):
                bucket |= bits[:, i].astype(np.int64) << i
            out = pdf[[id_col, vec_col]].copy()
            out["bucket"] = bucket
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, {vec_col} array<float>, bucket long"
    )


def lsh_bucket_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket or any
    bucket at hamming distance 1 (multi-probe)."""
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = add_lsh_bucket(emb, planes, id_col, vec_col)
    q = bucketed.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    # multi-probe: query bucket + all 1-bit flips (n_planes+1 probes)
    probes = q.select(
        "query_id",
        "qe",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ce"), "bucket"
    )
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_u",
            F.floor(cosine_sim_col(F.col("qe"), F.col("ce")) * 1e6 + F.lit(0.5)).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_u")
    )


def kmeans_centroids(sample: np.ndarray, n_clusters: int, seed: int = 42,
                     n_iter: int = 10) -> np.ndarray:
    """Plain deterministic Lloyd's k-means on a driver-side sample (numpy).

    The IVF coarse quantizer: at 100 TB the sample is a tiny fraction pulled
    with df.sample(); centroids (n_clusters x dim floats) broadcast cheaply.
    """
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].astype(np.float64).copy()
    for _ in range(n_iter):
        d = sample @ cent.T  # cosine-ish assignment on normalized data
        assign = d.argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def add_ivf_cluster(emb: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (one Arrow matmul pass)."""
    cent = centroids

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = _normalize_rows(
                np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            )
            out = pdf[[id_col, vec_col]].copy()
            out["cluster"] = (m @ cent.T).argmax(axis=1).astype(np.int32)
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, {vec_col} array<float>, cluster int"
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse k-means quantizer, probe the n_probe nearest cells.

    Scale path: the corpus is partitioned by cluster; a query scores only
    ~n_probe/n_clusters of the data.  Recall vs brute force pytest-verified.
    """
    # seeded sample, not limit(): limit takes the first partitions only,
    # biasing the quantizer toward whatever data happens to sort first
    n_total = emb.count()
    frac = min(1.0, 4096 / max(n_total, 1))
    rows = emb.sample(fraction=frac, seed=seed).limit(2048).collect()
    if not rows:
        rows = emb.limit(2048).collect()
    sample = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]
    )
    cent = kmeans_centroids(_normalize_rows(sample), n_clusters, seed)
    clustered = add_ivf_cluster(emb, cent, id_col, vec_col)

    q_rows = clustered.filter(F.col(id_col) < n_queries).collect()
    probes = []
    for r in q_rows:
        qv = _normalize_rows(np.asarray(r[vec_col], dtype=np.float64)[None, :])[0]
        order = np.argsort(-(cent @ qv))[:n_probe]
        for c in order:
            probes.append((int(r[id_col]), [float(x) for x in r[vec_col]], int(c)))
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(
        probes, f"query_id long, qe array<float>, cluster int"
    )
    c = clustered.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ce"),
        "cluster",
    )
    scored = (
        c.join(F.broadcast(probe_df), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_u",
            F.floor(
                cosine_sim_col(_as_double(F.col("qe")), F.col("ce")) * 1e6 + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_u")
        .distinct()
    )


def planted_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Corpus + deterministically derived near-duplicate rows (double[]).

    The raw fixture contains no >=0.9-cosine pair, which made near-dup
    queries pass vacuously on 0 == 0 rows.  Two derived families fix that
    without touching the read-only testdata:

    - exact twins: every vec_id % 50 == 7 row re-appears at id+1_000_000
      with the same vector (cosine exactly 1);
    - perturbed twins: every vec_id % 50 == 13 row re-appears at
      id+2_000_000 with element 0 doubled.  For any vector,
      cos(v, v + v0*e0) = (1+t)/sqrt(1+3t) with t = v0^2/|v|^2, minimized
      at t=1/3 giving 0.9428 — always above the 0.9 near-dup threshold.

    Doubling a float is exact in IEEE, and both engines do it on the
    double-cast vector, so the DuckDB twin is bit-identical.
    """
    e = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col))
    exact = e.filter(F.col(id_col) % 50 == 7).select(
        (F.col(id_col) + 1_000_000).alias(id_col), F.col(vec_col)
    )
    pert = e.filter(F.col(id_col) % 50 == 13).select(
        (F.col(id_col) + 2_000_000).alias(id_col),
        F.concat(
            F.array(F.col(vec_col).getItem(0) * 2.0),
            F.expr(f"slice({vec_col}, 2, size({vec_col}) - 1)"),
        ).alias(vec_col),
    )
    return e.unionAll(exact).unionAll(pert)


SQL_PLANTED_EMB = """
    WITH pl AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings WHERE vec_id % 50 = 7
      UNION ALL
      SELECT vec_id + 2000000,
             list_prepend((embedding::DOUBLE[])[1] * 2.0, (embedding::DOUBLE[])[2:])
      FROM embeddings WHERE vec_id % 50 = 13
    )
"""


def embedding_near_dups(
    emb: DataFrame,
    threshold_u: int = 990_000,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH bucketing:
    only same-bucket pairs are scored — no O(n^2) cross join."""
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = add_lsh_bucket(emb, planes, id_col, vec_col)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("ea"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("eb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim_u",
            F.floor(cosine_sim_col(F.col("ea"), F.col("eb")) * 1e6 + F.lit(0.5)).cast("long"),
        )
        .filter(F.col("sim_u") >= threshold_u)
        .select("id_a", "id_b", "sim_u")
        .distinct()
    )
