"""First-touch latency: cold-after-warmup vs warm per heavy query.

VERDICT r04 #7: `embedding_near_dups_lsh` measured 5.3 s cold vs 1.5 s warm
(parquet footers + codegen JIT + Arrow worker forks landing inside the
first measured run).  bench.py now warms EVERY input table + the Arrow
workers before measuring; this script verifies the fix — fresh session,
`warm_tables`, then each query timed twice.  Done-bar: max cold/warm < 2.

Writes dist/r05_coldwarm.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import calibrate_steal, make_spark, warm_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = [
    "embedding_near_dups_lsh",
    "minhash_near_dups",
    "winnow_pairs",
    "simhash_near_dups",
    "ann_recall",
    "decontaminate",
]


def main() -> None:
    from crawler_news_spark import queries as Q

    spark = make_spark()
    t_warm = warm_tables(spark, SF_DIR)
    reg = Q.queries()
    out = {"warmup_sec": t_warm, "sf_dir": SF_DIR,
           "calibration": calibrate_steal(), "queries": {}}
    worst = 0.0
    for name in HEAVY:
        t0 = time.time()
        reg[name](spark, SF_DIR).count()
        cold = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        reg[name](spark, SF_DIR).count()
        warm = time.time() - t0
        spark.catalog.clearCache()
        ratio = cold / warm
        worst = max(worst, ratio)
        out["queries"][name] = {"cold_s": round(cold, 3),
                                "warm_s": round(warm, 3),
                                "ratio": round(ratio, 2)}
        print(f"  {name}: cold {cold:.2f}s warm {warm:.2f}s "
              f"ratio {ratio:.2f}", file=sys.stderr, flush=True)
    out["max_ratio"] = round(worst, 2)
    out["calibration_post"] = calibrate_steal()
    with open(os.path.join(ROOT, "dist", "r05_coldwarm.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
