"""Frontier-scale and host-cardinality rehearsals (VERDICT r07 items 6+7).

Two stress shapes toward the 10^10-URL north star, both run in-process so
the catalog can be inspected BEFORE cleanup:

--frontier [--types 4096]: the bench web scaled to a multi-million-URL
  frontier (types_per_host x 4 hosts, depth 16).  Reports URLs/s, wave
  count, peak driver-python and JVM RSS, bloom table bytes, catalog bytes,
  manifest bytes — the O(frontier) creep watchlist.  At types=768 the crawl
  is the 407k profile; 4096 is ~2.2M URLs.

--hosts [--n-hosts 10000]: a web of N distinct hosts (1 type, depth 2
  each) vs the 36-host default at a comparable URL count.  If any O(hosts)
  driver-side structure crept back (per-host clocks, politeness dims,
  robots maps held as Python dicts), the N=10k run's driver-synchronous
  time and RSS blow up relative to N=36.

Appends one JSON line per run to dist/r08_rehearsal.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "dist", "r08_rehearsal.jsonl")


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _child_java_pids() -> list[int]:
    out = []
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == me or int(parts[3]) == os.getppid():
                with open(f"/proc/{pid}/comm") as f:
                    if "java" in f.read():
                        out.append(int(pid))
        except (OSError, ValueError):
            continue
    return out


class RssSampler(threading.Thread):
    def __init__(self, period: float = 3.0):
        super().__init__(daemon=True)
        self.period = period
        self.peak_py = 0.0
        self.peak_jvm = 0.0
        # NOT named _stop: that would shadow threading.Thread's internal
        # _stop() and break join()
        self._halt = threading.Event()

    def run(self) -> None:
        jpids = _child_java_pids()
        while not self._halt.is_set():
            self.peak_py = max(self.peak_py, _rss_mb(os.getpid()))
            if not jpids:
                jpids = _child_java_pids()
            self.peak_jvm = max(
                self.peak_jvm, sum(_rss_mb(p) for p in jpids))
            self._halt.wait(self.period)

    def stop(self) -> None:
        self._halt.set()


def _du_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def many_host_web(n_hosts: int, seed: int = 7):
    """N distinct hosts, one type each, depth 2 — the host-cardinality axis
    isolated from frontier size."""
    from crawler_news_spark.sources import hostsim as hs

    profiles = list(hs.PROFILES)
    one_shot_only = {p for p in profiles if hs.PAGINATION[p] == "one-shot"}
    specs = tuple(
        hs.HostSpec(
            f"mh{i}.example.vn",
            profiles[i % len(profiles)],
            n_types=1,
            links_per_page=8,
            max_depth=1 if profiles[i % len(profiles)] in one_shot_only else 2,
            one_shot=profiles[i % len(profiles)] in one_shot_only,
            crawl_delay_s=0.5,
        )
        for i in range(n_hosts)
    )
    return hs.WebConfig(seed=seed, hosts=specs, page_weight=8)


def crawl(spark, web, batch_pages: int = 17) -> dict:
    from bench import calibrate_steal
    from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl

    root = tempfile.mkdtemp(prefix="rehearse_cat_")
    wc = WaveCrawl(
        spark, web, root,
        CrawlRunConfig(batch_pages=batch_pages, bloom_buckets=8,
                       bloom_expected_per_bucket=262144),
    )
    sampler = RssSampler()
    sampler.start()
    pre = calibrate_steal(n=3_000_000)
    t0 = time.time()
    wc.run()
    wall = time.time() - t0
    post = calibrate_steal(n=3_000_000)
    sampler.stop()
    sampler.join()

    m = wc.cat.read_manifest()
    n_urls = sum(w["n_fetched"] for w in m["waves"].values())
    res = {
        "n_urls": int(n_urls),
        "n_waves": len(m["waves"]),
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n_urls / wall, 2),
        "eff_cores_pre": round(pre["effective_cores"], 1),
        "eff_cores_post": round(post["effective_cores"], 1),
        "peak_driver_py_mb": round(sampler.peak_py, 1),
        "peak_jvm_mb": round(sampler.peak_jvm, 1),
        "manifest_bytes": os.path.getsize(
            os.path.join(root, "manifest.json"))
        if os.path.exists(os.path.join(root, "manifest.json")) else None,
        "bloom_bytes": _du_bytes(os.path.join(root, "bloom"))
        if os.path.isdir(os.path.join(root, "bloom")) else 0,
        "catalog_bytes": _du_bytes(root),
    }
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier", action="store_true")
    ap.add_argument("--types", type=int, default=4096)
    ap.add_argument("--hosts", action="store_true")
    ap.add_argument("--n-hosts", type=int, default=10_000)
    args = ap.parse_args()

    from crawler_news_spark.sources import hostsim as hs

    runs = []
    if args.frontier:
        runs.append(("frontier",
                     hs.bench_web(types_per_host=args.types),
                     {"types": args.types}))
    if args.hosts:
        runs.append(("hosts_baseline36", many_host_web(36), {"n_hosts": 36}))
        runs.append(("hosts", many_host_web(args.n_hosts),
                     {"n_hosts": args.n_hosts}))
    if not runs:
        ap.error("pick --frontier and/or --hosts")

    from crawler_news_spark.session import get_spark

    spark = get_spark(app_name="rehearse_scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    n_par = spark.sparkContext.defaultParallelism
    spark.range(n_par * 2, numPartitions=n_par).mapInPandas(
        lambda it: it, "id long").count()
    # throwaway warmup crawl: the FIRST crawl pays one-time
    # JVM/codegen/commit-path costs that would otherwise land entirely on
    # the first measured run (the small baseline, flattering the big one)
    crawl(spark, many_host_web(12))

    for tag, web, meta in runs:
        res = {"run": tag, **meta, **crawl(spark, web)}
        print(json.dumps(res), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
