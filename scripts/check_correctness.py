"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs each queries() entry at sf0.01 and its oracle_sql() twin in DuckDB,
sorts columns by name, stringifies + sorts rows, and compares value hashes —
the same convention the driver uses (columns sorted by name; pandas
conversion; order-insensitive value hash).

Usage:
    python scripts/check_correctness.py [query ...]   # default: all oracled
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        # dtype-faithful on purpose: the driver's gate distinguishes "40.0"
        # (HUGEINT->float64 pandas conversion) from "40" (int64) — so must we.
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def frame_hash(pdf) -> tuple[str, int, list[str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x1f".join(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return h, len(pdf), cols


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from crawler_news_spark.queries import oracle_sql, queries

    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    wanted = argv
    qs, osql = queries(), oracle_sql()
    names = wanted or [n for n in qs if n in osql]

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check_correctness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    out, n_bad = {}, 0
    for name in names:
        res: dict = {}
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            sh, srows, scols = frame_hash(sdf)
            res.update(spark_rows=srows, spark_cols=scols)
            if name in osql:
                odf = con.sql(osql[name]).df()
                oh, orows, ocols = frame_hash(odf)
                res.update(
                    oracle_rows=orows,
                    rows_match=srows == orows,
                    schema_match=scols == ocols,
                    hash_match=sh == oh,
                )
                if not res["hash_match"]:
                    n_bad += 1
                    if scols == ocols and srows == orows:
                        # show first differing row pair for debugging
                        a = sorted(
                            "\x1f".join(_norm_cell(v) for v in r)
                            for r in sdf[sorted(sdf.columns)].itertuples(index=False)
                        )
                        b = sorted(
                            "\x1f".join(_norm_cell(v) for v in r)
                            for r in odf[sorted(odf.columns)].itertuples(index=False)
                        )
                        diff = next(
                            ((x, y) for x, y in zip(a, b) if x != y), None
                        )
                        res["first_diff"] = diff
            else:
                res["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            res["err"] = f"{type(e).__name__}: {e}"
            n_bad += 1
        out[name] = res
        flag = "OK " if res.get("hash_match") else ("--" if res.get("err") == "no_oracle" else "BAD")
        print(f"[{flag}] {name}: {json.dumps(res, default=str)[:300]}")

    print(f"\n{len(names) - n_bad}/{len(names)} green")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "results": out}, f, indent=1, default=str)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
