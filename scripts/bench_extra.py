#!/usr/bin/env python
"""Lightweight per-query timing sweep (NOT the frozen bench): times every
BENCH_QUERIES entry at $SPARK_GRAFT_SF_DIR with N reps, no window gating.
Used for r09 optimization before/after evidence; cite alongside bench.py."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, QUERY_FAMILIES, SHARED_CACHE_FAMILIES, calibrate_steal, warm_tables  # noqa: E402
from crawler_news_spark.session import get_spark  # noqa: E402
from crawler_news_spark import queries as Q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
REPS = int(os.environ.get("SWEEP_REPS", "2"))

spark = get_spark(app_name="bench_extra")
warm = warm_tables(spark, SF_DIR)
print(f"warmup {warm}s", file=sys.stderr)
reg = Q.queries()
out = {}
pre = calibrate_steal()
for fam, qnames, _r in QUERY_FAMILIES:
    for name in qnames:
        ts = []
        for rep in range(REPS):
            if fam in SHARED_CACHE_FAMILIES and rep > 0:
                break  # memoized family: only the cold first rep is honest
            t0 = time.time()
            n = reg[name](spark, SF_DIR).count()
            ts.append(round(time.time() - t0, 3))
            if fam not in SHARED_CACHE_FAMILIES:
                spark.catalog.clearCache()
        out[name] = min(ts)
        print(f"  {name}: {ts} ({n} rows)", file=sys.stderr)
    if fam in SHARED_CACHE_FAMILIES:
        Q._evict_crawl_body_memo()
    spark.catalog.clearCache()
post = calibrate_steal()
print(json.dumps({"sf_dir": SF_DIR, "queries": out,
                  "eff_pre": pre["effective_cores"],
                  "eff_post": post["effective_cores"],
                  "total_query_sec": round(sum(out.values()), 2)}))
spark.stop()
