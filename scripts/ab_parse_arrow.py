"""A/B: mapInPandas vs mapInArrow for the fused article fetch+parse vUDF.

VERDICT r07 item 5: the articles section is the dominant crawl cost (138 s
of the 407k-URL profile); the hypothesis is that skipping the per-batch
pandas<->Arrow conversions (mapInArrow) buys a measurable slice.  This
harness isolates exactly that section:

- build ONE article frontier from bench_web listings (the production link
  extraction path: fetch_parse_listings -> explode -> canonicalize),
  persisted so both variants read identical cached input;
- run pandas/arrow variants interleaved (A/B/A/B..., so a steal drift hits
  both arms), each run = full scan + order-insensitive xxhash64 checksum of
  every output column (proves byte-equality of the two impls while forcing
  full materialization);
- report per-arm times, the checksum, and steal probes around each run.

Run:  python scripts/ab_parse_arrow.py [--reps 3] [--batch 2000,8000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", default="2000",
                    help="comma list of arrow maxRecordsPerBatch to test")
    ap.add_argument("--types", type=int, default=512)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import calibrate_steal
    from crawler_news_spark.functions.urlnorm import (
        canonical_hash_col,
        canonicalize_col,
    )
    from crawler_news_spark.operators import parse as P
    from crawler_news_spark.session import get_spark
    from crawler_news_spark.sources import hostsim as hs

    spark = get_spark(app_name="ab_parse_arrow")
    spark.sparkContext.setLogLevel("ERROR")

    web = hs.bench_web(types_per_host=args.types)
    listing_rows = [
        (s.host, t, 0) for s in web.hosts for t in range(s.n_types)
    ]
    listings = spark.createDataFrame(
        listing_rows, "host string, type_id int, page_no int"
    ).repartition(64)
    url = F.explode("out_links").alias("url")
    frontier = (
        P.fetch_parse_listings(web, listings)
        .select("host", "type_id", "page_no", url)
        .select(
            F.lit(1).alias("wave"),
            F.col("host"),
            "type_id",
            "page_no",
            F.lit(0).alias("link_index"),
            canonicalize_col(F.col("url")).alias("canonical_url"),
        )
        .withColumn("canonical_hash", canonical_hash_col(F.col("canonical_url")))
        .withColumn("fetch_ts", F.lit(0.0))
        .dropDuplicates(["canonical_hash"])
        .repartition(64)
        .persist()
    )
    n = frontier.count()
    print(f"frontier: {n} article urls", flush=True)

    out_cols = [
        "canonical_url", "title", "description", "content", "pub_date_raw",
        "author", "imageUrl", "comments", "contentImageUrls", "span_texts",
        "parse_ok",
    ]

    def one(impl) -> tuple[float, int, int]:
        fn = (P.fetch_parse_articles if impl == "pandas"
              else P.fetch_parse_articles_arrow)
        t0 = time.time()
        row = (
            fn(web, frontier)
            # modular order-insensitive checksum (plain sum of xxhash64
            # overflows long under ANSI mode)
            .select(F.pmod(F.xxhash64(*out_cols), F.lit(10 ** 12)).alias("h"))
            .agg(F.count("*").alias("n"), F.sum("h").alias("chk"))
            .collect()[0]
        )
        return round(time.time() - t0, 2), row["n"], row["chk"]

    # warmup both python-worker pools once, untimed
    one("pandas")
    one("arrow")

    results = []
    for batch in [int(b) for b in args.batch.split(",")]:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch))
        for rep in range(args.reps):
            for impl in ("pandas", "arrow"):
                pre = calibrate_steal(n=3_000_000)
                t, cnt, chk = one(impl)
                results.append({
                    "impl": impl, "batch": batch, "rep": rep, "sec": t,
                    "rows": cnt, "checksum": chk,
                    "eff_cores": round(pre["effective_cores"], 1),
                })
                print(json.dumps(results[-1]), flush=True)

    chks = {r["checksum"] for r in results}
    by = {}
    for r in results:
        by.setdefault((r["impl"], r["batch"]), []).append(r["sec"])
    summary = {
        "n_urls": n,
        "checksum_equal": len(chks) == 1,
        "min_sec": {f"{i}@{b}": min(v) for (i, b), v in by.items()},
        "median_sec": {f"{i}@{b}": sorted(v)[len(v) // 2]
                       for (i, b), v in by.items()},
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
