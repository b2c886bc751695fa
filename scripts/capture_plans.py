#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/r09/.

Usage: python scripts/capture_plans.py <repo_root> <suffix> [query ...]
(repo_root lets the r08 worktree produce the _before plans).
"""
import os
import sys

repo = sys.argv[1]
suffix = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, repo)
os.chdir(repo)

OUT = "/root/repo/plans/r09"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from crawler_news_spark.session import get_spark  # noqa: E402
from crawler_news_spark import queries as Q  # noqa: E402

spark = get_spark(app_name=f"plans_{suffix}")
reg = Q.queries()
os.makedirs(OUT, exist_ok=True)
for name in names:
    try:
        df = reg[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(f"{OUT}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"ok {name}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {e}", file=sys.stderr)
spark.stop()
