#!/usr/bin/env python
"""Measure this machine's effective CPU parallelism (hypervisor steal).

Runs an embarrassingly-parallel pure-CPU kernel at several process counts
and reports effective cores + the best-achievable N->4N scaling ratio for
perfectly parallel work.  The crawl bench's scaling efficiency must be read
against this ceiling: a virtualized sandbox that only delivers ~19 effective
cores at 32-way cannot show 4x speedup from 8->32 no matter the engine.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def burn(args):
    (n,) = args
    x = 0
    for i in range(n):
        x += i * i
    return x


def main() -> None:
    N = 30_000_000
    walls = {}
    for procs in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(burn, [(N,)] * procs)
        walls[procs] = time.time() - t0
    base = walls[1]
    eff_cores = {p: round(base * p / w, 2) for p, w in walls.items()}
    ceilings = {
        f"{n}->{4*n}": round(eff_cores[4 * n] / (4 * eff_cores[n]), 3)
        for n in (2, 4, 8)
    }
    print(json.dumps({"effective_cores": eff_cores, "scaling_ceilings": ceilings}))


if __name__ == "__main__":
    main()
