#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "crawl": {"n_urls": ..., "urls_per_sec": ...}}

--scaling: runs the identical crawl job at two parallelism levels
(local[8] and local[32]) in fresh subprocesses on the same deterministic
synthetic frontier and reports throughput at both plus the scaling
efficiency (throughput ratio / core ratio) — the sandbox stand-in for the
north rule's N -> 4N executor requirement (see BASELINE.md).

--crawl-only: single crawl throughput run (used by --scaling subprocesses).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "exact_dedup",
    "keepfirst_dedup",
    "fingerprint",
    "token_count",
    "lang_id",
    "quality_score",
    "repetition_quality",
    "decontaminate",
    "hash_sample",
    "stratified_sample",
    "pack_sequences",
    "top_keywords",
    "minhash_signatures",
    "minhash_near_dups",
    "simhash_near_dups",
    "winnow_pairs",
    "images_metadata",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "ann_recall",
    "embedding_near_dups_lsh",
    "media_metadata",
    "media_resize",
    "media_features",
    "pricing_summary",
    "sessionize",
    "windowed_counts",
    "rollup_revenue",
    "pivot_events",
    "topk_per_group",
    "date_range",
    "date_range_typed",
    "group_count",
    "top_revenue_nations",
    "shipping_priority",
    "length_percentiles",
    "promo_revenue",
    "supplier_geography",
    "order_priority_count",
]


def make_spark(master: str | None = None):
    from crawler_news_spark.session import get_spark

    return get_spark(app_name="bench", master=master)


def run_crawl(spark, scale: float = 4.0, batch_pages: int = 16,
              web_kind: str = "default", types: int = 256) -> dict:
    """Deterministic synthetic crawl; returns {n_urls, wall_s, urls_per_sec}.

    n_urls counts fetched+parsed pages (listings + articles) — the
    BASELINE.json metric is 'URLs fetched+parsed per second (sustained)'.
    web_kind 'bench' uses realistic-weight pages (hostsim.bench_web) so the
    run is compute-bound like a production crawl; 'default' is the light
    correctness web.
    """
    from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
    from crawler_news_spark.sources import hostsim as hs

    if web_kind == "bench":
        web = hs.bench_web(types_per_host=types)
        batch_pages = 17
    else:
        web = hs.default_web(scale=scale)
    root = tempfile.mkdtemp(prefix="bench_cat_")
    wc = WaveCrawl(
        spark, web, root,
        CrawlRunConfig(batch_pages=batch_pages, bloom_buckets=8,
                       bloom_expected_per_bucket=262144),
    )
    # warm up the session (JVM + python workers) so timing is steady-state —
    # the mapInPandas pass forks the Arrow Python workers, which otherwise
    # cold-start inside the first measured wave (~3 s on 32 cores)
    spark.range(1000).selectExpr("sum(id)").collect()
    n_par = spark.sparkContext.defaultParallelism
    spark.range(n_par * 2, numPartitions=n_par).mapInPandas(
        lambda it: it, "id long"
    ).count()
    t0 = time.time()
    wc.run()
    wall = time.time() - t0
    m = wc.cat.read_manifest()
    n_urls = sum(w["n_fetched"] for w in m["waves"].values())
    # a stress catalog is multi-GB; leaving them around fills the sandbox
    # disk and page cache — a full disk measured 2.8x slower on this box
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_urls": int(n_urls),
        "n_waves": len(m["waves"]),
        "wall_s": round(wall, 3),
        "urls_per_sec": round(n_urls / wall, 2),
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from crawler_news_spark import queries as Q

    reg = Q.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = reg[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
        # isolate measurements: composite operators persist skinny
        # intermediates that must outlive their own action; dropping them
        # between queries keeps executor storage from bleeding into the
        # NEXT query's time (r02 embedding-family regression root cause)
        spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--crawl-scale", type=float, default=4.0)
    ap.add_argument("--web", default="default", choices=["default", "bench"])
    ap.add_argument("--types", type=int, default=256)
    ap.add_argument("--scaling-n", type=int, default=2,
                    help="N for the N vs 4N scaling pair (this VM's "
                         "hypervisor caps perfect CPU scaling at 8->32 to "
                         "~0.69, see BENCH.md calibration; 2->8 allows 0.94)")
    args = ap.parse_args()

    if args.crawl_only:
        spark = make_spark()
        res = run_crawl(spark, scale=args.crawl_scale, web_kind=args.web,
                        types=args.types)
        print(json.dumps(res))
        spark.stop()
        return

    if args.scaling:
        n, n4 = args.scaling_n, 4 * args.scaling_n
        results = {}
        for cores in (n, n4):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
                       SPARK_MASTER=f"local[{cores}]")
            out = subprocess.run(
                [sys.executable, __file__, "--crawl-only", "--web", "bench",
                 "--types", str(args.types),
                 "--crawl-scale", str(args.crawl_scale)],
                env=env, capture_output=True, text=True, check=True,
            )
            results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
            print(f"local[{cores}]: {results[cores]}", file=sys.stderr)
        eff = (results[n4]["urls_per_sec"] / results[n]["urls_per_sec"]) / 4.0
        print(json.dumps({
            f"local{n}_urls_per_sec": results[n]["urls_per_sec"],
            f"local{n4}_urls_per_sec": results[n4]["urls_per_sec"],
            "core_ratio": 4,
            "scaling_efficiency": round(eff, 3),
            "n_urls": results[n4]["n_urls"],
        }))
        return

    spark = make_spark()
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    t_all = time.time()
    # types=256 (135k URLs): large enough that per-run fixed cost (plan
    # compilation, snapshot commits) doesn't dominate the throughput figure
    crawl = run_crawl(spark, web_kind="bench", types=256)
    print(f"  crawl: {crawl}", file=sys.stderr)
    qtimes = run_queries(spark, SF_DIR)
    total = round(time.time() - t_all, 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
