"""10x scale spot-check for the round-6 dedup additions (BENCH.md style).

Both checks exploit an exact replication invariant instead of a statistical
recall estimate:

- dup_span_dedup: replicate the sf0.1 documents table 10x with shifted ids
  (50,000 docs; originals keep the minimal ids).  Every window of a replica
  is a non-first occurrence, so replicas lose every token; the originals'
  first-occurrence structure is untouched because replicas only ever sort
  AFTER them.  The 10x output must therefore equal the 1x output EXACTLY —
  row for row — while the operator chews 10x the windows.

- semantic_dedup: replicate the sf0.1 embeddings 10x with shifted ids
  (20,000 vectors).  An identical vector always lands in its base's k-means
  cluster and loses the keep-lowest-id contest, so every one of the 18,000
  replicas must be dropped and the kept set must be a subset of the base
  ids (the base KEPT set itself may legitimately shift — 10x density moves
  the k-means centroids).

Writes dist/r06_span_semantic_spotcheck.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import calibrate_steal, make_spark  # noqa: E402

SHIFT = 1_000_000


def _replicate(df, id_col, n_rep):
    from pyspark.sql import functions as F

    out = df
    for k in range(1, n_rep):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + SHIFT * k)
        )
    return out


def main() -> None:
    from crawler_news_spark import queries as Q
    from crawler_news_spark.operators import similarity as SIM

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    res = {}

    # --- dup_span_dedup: 10x output must equal 1x output exactly ---------
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    base = {
        (r["doc_id"], r["n_kept"], r["n_removed"], r["text"])
        for r in Q._dup_span_dedup_frame(docs).collect()
    }
    big = _replicate(docs, "doc_id", 10).persist()
    n_big = big.count()
    pre = calibrate_steal()
    t0 = time.time()
    got = {
        (r["doc_id"], r["n_kept"], r["n_removed"], r["text"])
        for r in Q._dup_span_dedup_frame(big).collect()
    }
    wall = time.time() - t0
    post = calibrate_steal()
    res["dup_span_dedup"] = {
        "n_docs_10x": int(n_big),
        "rows_1x": len(base),
        "rows_10x": len(got),
        "replication_invariant": got == base,
        "wall_s_10x": round(wall, 2),
        "calibration_pre": pre,
        "calibration_post": post,
    }
    big.unpersist()

    # --- semantic_dedup: every replica dropped, kept subset of base ids --
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = emb.count()
    big_e = _replicate(emb, "vec_id", 10).persist()
    n_big_e = big_e.count()
    pre = calibrate_steal()
    t0 = time.time()
    kept = [r["vec_id"] for r in SIM.semantic_dedup(big_e, threshold_u=900_000).collect()]
    wall = time.time() - t0
    post = calibrate_steal()
    res["semantic_dedup"] = {
        "n_vecs_10x": int(n_big_e),
        "n_base": int(n_base),
        "n_kept": len(kept),
        "all_replicas_dropped": all(v < SHIFT for v in kept),
        "kept_le_base": len(kept) <= n_base,
        "wall_s_10x": round(wall, 2),
        "calibration_pre": pre,
        "calibration_post": post,
    }
    big_e.unpersist()

    with open(os.path.join(ROOT, "dist", "r06_span_semantic_spotcheck.json"), "w") as f:
        f.write(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
