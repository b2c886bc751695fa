"""Skew-resilience measurement: uniform vs pathological (one host = 50% of
the frontier) crawl throughput at the 407k-URL scale, interleaved U/S/U/S so
hypervisor drift hits both sides equally; steal probes around every leg.

Writes dist/r05_skew.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import calibrate_steal  # noqa: E402


def leg(web: str, types: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_MASTER="local[32]")
    pre = calibrate_steal()
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--crawl-only",
         "--web", web, "--types", str(types)],
        env=env, capture_output=True, text=True, check=True,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["web"] = web
    res["calibration_pre"] = pre
    res["calibration_post"] = calibrate_steal()
    print(json.dumps(res), flush=True)
    return res


def main() -> None:
    types = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    legs = [leg(w, types) for w in ("bench", "skew", "bench", "skew")]
    uni = [r["urls_per_sec"] for r in legs if r["web"] == "bench"]
    skw = [r["urls_per_sec"] for r in legs if r["web"] == "skew"]
    summary = {
        "types": types,
        "uniform_urls_per_sec": uni,
        "skew_urls_per_sec": skw,
        "uniform_best": max(uni),
        "skew_best": max(skw),
        "slowdown_best": round(max(uni) / max(skw), 3),
        "legs": legs,
    }
    with open(os.path.join(ROOT, "dist", "r05_skew.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "legs"}))


if __name__ == "__main__":
    main()
