"""10x scale spot-check for the cross-corpus dedup join (BENCH.md §6 style).

Existing corpus = the sf0.1 documents table replicated 9x with shifted ids
(45,000 docs, every replica byte-identical to its source); new batch = the
original 5,000.  Every new doc therefore has exactly 9 near-duplicates
(jaccard 1.0) in the corpus — 45,000 true cross pairs the banded LSH must
surface and the exact verify must confirm, with zero corpus self-join work.

Writes dist/r05_cross_spotcheck.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import calibrate_steal, make_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from crawler_news_spark.operators import dedup as DD

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    new_batch = docs
    old = None
    for k in range(1, 10):
        rep = docs.select((F.col("doc_id") + 100_000 * k).alias("doc_id"), "text")
        old = rep if old is None else old.unionByName(rep)
    old = old.persist()
    n_old = old.count()

    pre = calibrate_steal()
    t0 = time.time()
    pairs = DD.minhash_cross_near_dups(new_batch, old, threshold_u=900_000)
    n_pairs = pairs.count()
    wall = time.time() - t0
    post = calibrate_steal()

    res = {
        "n_new": 5000,
        "n_old": int(n_old),
        "true_pairs": 45000,
        "found_pairs": int(n_pairs),
        "recall": round(n_pairs / 45000, 4),
        "wall_s": round(wall, 2),
        "calibration_pre": pre,
        "calibration_post": post,
    }
    with open(os.path.join(ROOT, "dist", "r05_cross_spotcheck.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
