"""The bench's stdout contract (VERDICT r07 item 1).

The driver records only a bounded tail of bench.py's stdout; for several
rounds the final JSON line exceeded it and the artifact landed with
parsed:null.  These tests pin the fix: the compact line always fits the
budget, parses, and carries enough to recover per-query steal-normalized
times; the full record round-trips through the detail dict.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _fake_measurements():
    qtimes = {q: round(0.3 + 3.7 * ((hash(q) % 997) / 997) + (107.9 if q == "corpus_build" else 0), 3)
              for q in bench.BENCH_QUERIES}
    qeff = {q: round(8.0 + 24.0 * ((hash(q) % 31) / 31), 2)
            for q in bench.BENCH_QUERIES}
    windows = [
        {"family": fam, "attempt": 0, "queries": qs,
         "eff_cores_pre": 25.0, "eff_cores_post": 11.0,
         "clean": fam != "corpus"}
        for fam, qs, _r in bench.QUERY_FAMILIES
    ]
    crawl = {
        "n_urls": 135660, "n_waves": 12, "wall_s": 30.5,
        "urls_per_sec": 4446.9, "n_attempts": 2,
        "attempts": [
            {"urls_per_sec": 4100.0, "eff_cores_pre": 18.0,
             "eff_cores_post": 20.0},
            {"urls_per_sec": 4446.9, "eff_cores_pre": 27.3,
             "eff_cores_post": 26.1},
        ],
    }
    qcal = {"procs": 32, "effective_cores": 24.5, "steal_frac": 0.234}
    return qtimes, qeff, windows, crawl, qcal


def test_line_fits_tail_budget_and_parses():
    qtimes, qeff, windows, crawl, qcal = _fake_measurements()
    line_str, detail = bench.build_report(
        qtimes, qeff, windows, crawl, 12.3, qcal, 512.4, "0.1",
        "/root/repo/BENCH_DETAIL.json")
    assert "\n" not in line_str
    assert len(line_str) <= bench.STDOUT_LINE_BUDGET
    line = json.loads(line_str)
    assert line["metric"] == "total_bench_sec"
    assert line["unit"] == "sec"
    assert line["sf"] == 0.1
    assert line["queries"] == qtimes
    assert line["detail"] == "/root/repo/BENCH_DETAIL.json"
    # the tail the driver keeps must contain the whole line
    fake_stdout = "noise\n" * 50 + line_str + "\n"
    tail = fake_stdout[-2000:]
    recovered = json.loads(tail[tail.index('{"metric"'):])
    assert recovered == line


def test_line_carries_recoverable_steal_normalization():
    qtimes, qeff, windows, crawl, qcal = _fake_measurements()
    line_str, detail = bench.build_report(
        qtimes, qeff, windows, crawl, 12.3, qcal, 512.4, "0.1", "d.json")
    line = json.loads(line_str)
    assert "eff_cores" in line, "eff array was dropped despite fitting"
    assert len(line["eff_cores"]) == len(line["queries"])
    # normalized time is exactly recoverable: t x eff/cpus
    for (q, t), eff in zip(line["queries"].items(), line["eff_cores"]):
        assert eff == qeff[q]
        expect = round(t * min(eff / line["cpus"], 1.0), 3)
        assert abs(detail["queries_norm"][q] - expect) < 1e-9
    # detail keeps the full window log the line omits
    assert detail["query_windows"] == windows
    assert detail["clean_families"] == line["clean_families"] == "9/10"
    # crawl normalization scales throughput UP to the full machine
    cl = line["crawl"]
    assert cl["eff_cores"] == 26.1
    assert cl["urls_per_sec_norm"] >= cl["urls_per_sec"]


def test_line_degrades_but_never_exceeds_budget():
    qtimes, qeff, windows, crawl, qcal = _fake_measurements()
    # inflate every time to 7-char values to stress the size guard
    qtimes = {q: v + 1000.0 for q, v in qtimes.items()}
    line_str, _ = bench.build_report(
        qtimes, qeff, windows, crawl, 12.3, qcal, 51234.5, "0.1", "d.json")
    assert len(line_str) <= bench.STDOUT_LINE_BUDGET
    line = json.loads(line_str)
    assert line["queries"] == qtimes  # per-query times never dropped
