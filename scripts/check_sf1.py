"""sf1 (10x) correctness + growth gate for the heavy dedup family.

VERDICT r07 item 2: the 100-TB scale claims rested on design argument plus
sf0.1 measurements; this script demonstrates the actual curve one decade
up.  Two legs:

1. **Relational heavy family** over a deterministic two-size document set:
   sfb (5,000 docs — the sf0.1 size) and sf1 (50,000 docs), SAME generator
   (:func:`gen_docs`), so the growth ratio is apples-to-apples.  The
   generator is NOT the driver's closed-31-token fixture naively scaled:
   measured on that fixture, 6.7% of ALL doc pairs are LSH band candidates
   already at 5k docs (833k of 12.5M — the shingle universe is closed, so
   random-pair Jaccard is far above the banding threshold), and scaling
   doc count 10x with a fixed content space makes the TRUE near-dup
   density itself quadratic: 87M candidate pairs at 50k docs, ~80 GB in
   the DuckDB twin.  No dedup algorithm is sub-quadratic on a workload
   whose answer is quadratic — and no real corpus looks like that: at web
   scale the content space grows with the corpus and duplication density
   is scale-invariant (duplicates per doc, not per doc-pair).  The sf1
   generator therefore emulates the production shape: a large surface
   vocabulary (the 31 fixture stems x 400 numeric suffixes -> random-pair
   Jaccard ~ 0) plus PLANTED duplicate structure that grows linearly —
   0.16% exact-dup pairs, 1% near-dup pairs (15% of token positions
   resampled), 2% shared-8-token-span pairs — so every rung of the dedup
   ladder has non-trivial, linearly-growing bite.  Embeddings stay
   unit-norm random float32[64] (the engine derives its own near-dup
   twins via planted_embeddings).  Each query runs on Spark AND its
   registry oracle_sql() twin in DuckDB over the same parquet — the
   identical convention as the driver's sf0.01 gate.

2. **Corpus family** over a ~10x syndicated web
   (corpus_web(scale=2.0, wire_stories=160) -> 3,062 crawled docs vs the
   fixture's 323): Spark crawls the web and runs the full pipeline
   (corpus_build_stages(web=...)), the twin replays every stage in DuckDB
   over the INDEPENDENT single-threaded py-oracle's span export for the
   same web — so the sf1 corpus leg is end-to-end (crawl + 11 stages), not
   just the relational tail.  Here the duplication IS linear by
   construction (wire syndication), so no generator change is needed.

Each query is timed at both sizes in the same session order, with a steal
probe (bench.calibrate_steal) around each leg so a dirty hypervisor window
is visible in the artifact rather than silently inflating the growth
ratio.  Output: CORRECTNESS_SF1.json at the repo root — per query:
hash_match at both sizes, t_sfb, t_sf1, growth, window effective cores —
plus a printed table for BENCH.md.

Usage:
    python scripts/check_sf1.py [--gen-only] [--skip-corpus] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFB_DIR = os.path.join(ROOT, "dist", "sfb")  # 5k docs, same generator
SF1_DIR = os.path.join(ROOT, "dist", "sf1")  # 50k docs
SF01_DIR = "/root/testdata/sf0.1"
OUT_PATH = os.path.join(ROOT, "CORRECTNESS_SF1.json")
SPANS_SF1 = os.path.join(SF1_DIR, "corpus_spans_sf1.parquet")

N_DOCS_B, N_VECS_B = 5_000, 2_000
N_DOCS_1, N_VECS_1 = 50_000, 20_000
GEN_SEED = 20260818

# Token surface: 7 uniform base-36 chars.  The operator shingles CHAR-5
# windows, so any >= 5-char fragment shared across docs becomes a
# universal shingle — measured: with the fixture's full stems
# ('filter...'), stem-internal shingles sit in 77% of docs and random-pair
# Jaccard lands at ~0.1-0.15; even a 2-char shared class prefix left
# enough boundary-shingle sharing (J ~ 0.005) that n^2 = 1.25e9 pairs at
# 50k docs still produced a quadratic candidate set (P(band) = J^2).
# With fully random 7-char tokens every 5-char window carries >= 4 random
# chars (36^4 = 1.7M variants), J(random pair) ~ 1e-5, and the candidate
# set comes only from the PLANTED duplicate structure.
TOKEN_SPACE = 36 ** 7
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
EXACT_DUP_RATE = 0.0016   # planted exact pairs, fraction of docs
NEAR_DUP_RATE = 0.01      # planted near-dup copies (15% tokens resampled)
SPAN_DUP_RATE = 0.02      # planted shared-8-token-span copies
SPAN_K = 8

# documents/embeddings-based heavy entries (registry names); the corpus
# family is handled separately (scaled web + retargeted twin)
DOC_QUERIES = [
    "minhash_near_dups",
    "near_dup_components",
    "dup_span_dedup",
    "token_budget_mix",
    "semantic_dedup",
]

CORPUS_SCALE, CORPUS_WIRE = 2.0, 160  # -> 3,062 docs (9.5x the 323 fixture)


def gen_docs(out_dir: str, n_docs: int, n_vecs: int) -> None:
    """Deterministically generate documents + embeddings parquet at
    ``out_dir`` (symlinks to the read-only sf0.1 files for the other eight
    tables).  Same process at every size — growth ratios between two
    generated dirs are apples-to-apples."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(GEN_SEED)

    # ---- documents: mostly-unique token streams ----
    import numpy as _np

    digits = _np.frombuffer(b"0123456789abcdefghijklmnopqrstuvwxyz",
                            dtype="S1")

    def mk_toks(count: int) -> list[str]:
        """``count`` random 7-char base-36 tokens, vectorized."""
        v = rng.integers(TOKEN_SPACE, size=count, dtype=_np.int64)
        chars = _np.empty((count, 7), dtype="S1")
        for j in range(6, -1, -1):
            chars[:, j] = digits[v % 36]
            v //= 36
        return chars.view("S7").ravel().astype(str).tolist()

    def mk_tok() -> str:
        return mk_toks(1)[0]

    n_tok = rng.integers(10, 100, size=n_docs)
    toks_flat = mk_toks(int(n_tok.sum()))
    docs, off = [], 0
    for k in n_tok:
        docs.append(toks_flat[off:off + k])
        off += k

    def pick_pairs(rate: float) -> "_np.ndarray":
        n_pairs = int(round(n_docs * rate / 2))
        return rng.choice(n_docs, size=2 * n_pairs, replace=False).reshape(-1, 2)

    # planted near-duplicates: b := a with 15% of positions resampled
    for a, b in pick_pairs(NEAR_DUP_RATE * 2):
        t = list(docs[a])
        n_mut = max(1, int(0.15 * len(t)))
        for pos in rng.choice(len(t), size=min(n_mut, len(t)), replace=False):
            t[pos] = mk_tok()
        docs[b] = t
    # planted shared spans: an 8-token window of a spliced into b
    for a, b in pick_pairs(SPAN_DUP_RATE * 2):
        if len(docs[a]) < SPAN_K or len(docs[b]) < SPAN_K:
            continue
        i = rng.integers(0, len(docs[a]) - SPAN_K + 1)
        j = rng.integers(0, len(docs[b]) - SPAN_K + 1)
        docs[b] = docs[b][:j] + docs[a][i:i + SPAN_K] + docs[b][j + SPAN_K:]
    # planted exact duplicates (applied LAST so they stay byte-exact)
    for a, b in pick_pairs(EXACT_DUP_RATE * 2):
        docs[b] = docs[a]

    texts = [" ".join(t) for t in docs]
    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                               pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        os.path.join(out_dir, "documents.parquet"),
    )

    # ---- embeddings ----
    E = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n_vecs).astype(np.int32)),
        }),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    # other tables: symlink the read-only sf0.1 parquet (registered as
    # DuckDB views; none of the heavy family reads them)
    for t in ("region nation customer supplier part orders lineitem events"
              ).split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF01_DIR, f"{t}.parquet"), dst)
    print(f"generated {out_dir}: documents={n_docs} embeddings={n_vecs}")


def export_sf1_spans() -> None:
    """py-oracle crawl of the 10x syndicated web -> span parquet (the
    independent input of the corpus twin, same as
    scripts/export_corpus_oracle.py for the fixture web)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_news_spark.oracle.pyoracle import crawl_oracle
    from crawler_news_spark.sources import hostsim as hs

    res = crawl_oracle(
        hs.corpus_web(scale=CORPUS_SCALE, wire_stories=CORPUS_WIRE),
        batch_pages=3,
    )
    cols = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    for doc_id, spans in res.documents.items():
        for s in spans:
            cols["doc_id"].append(doc_id)
            cols["kind"].append(s["kind"])
            cols["text"].append(s["text"])
            cols["media_ref"].append(s["media_ref"])
            cols["offset"].append(s["offset"])
    pq.write_table(
        pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "kind": pa.array(cols["kind"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "media_ref": pa.array(cols["media_ref"], pa.string()),
            "offset": pa.array(cols["offset"], pa.int32()),
        }),
        SPANS_SF1,
    )
    print(f"exported {len(set(cols['doc_id']))} oracle docs -> {SPANS_SF1}")


def _hash(pdf):
    from check_correctness import frame_hash

    return frame_hash(pdf)


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    # belt-and-braces: a mis-scaled fixture once drove the twin to 80+ GB
    # (see module docstring) — fail fast instead of taking the box down
    con.sql("SET memory_limit='24GB'")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    argv = sys.argv[1:]
    gen_only = "--gen-only" in argv
    skip_corpus = "--skip-corpus" in argv
    wanted = [a for a in argv if not a.startswith("--")]

    if not os.path.exists(os.path.join(SFB_DIR, "documents.parquet")):
        gen_docs(SFB_DIR, N_DOCS_B, N_VECS_B)
    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        gen_docs(SF1_DIR, N_DOCS_1, N_VECS_1)
    if not gen_only and not skip_corpus and not os.path.exists(SPANS_SF1):
        export_sf1_spans()
    if gen_only:
        return 0

    from pyspark.sql import SparkSession

    from bench import calibrate_steal
    from crawler_news_spark import queries as Q

    qs, osql = Q.queries(), Q.oracle_sql()
    doc_names = [n for n in (wanted or DOC_QUERIES) if n in DOC_QUERIES]

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check_sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/parquet-footer paths before ANY timed leg: the
    # first Spark action pays tens of seconds of one-time cost, and it
    # would land on the small leg (timed first), deflating every growth
    # ratio — the flattering direction, so spend it here instead
    for d in (SFB_DIR, SF1_DIR):
        spark.read.parquet(os.path.join(d, "documents.parquet")) \
            .groupBy("lang").count().collect()
        spark.read.parquet(os.path.join(d, "embeddings.parquet")) \
            .selectExpr("sum(label)").collect()

    results: dict[str, dict] = {}

    def leg(name, spark_fn, sql, con, scale_tag, res):
        pre = calibrate_steal(n=3_000_000)
        t0 = time.time()
        pdf = spark_fn().toPandas()
        t_spark = round(time.time() - t0, 2)
        sh, srows, scols = _hash(pdf)
        t0 = time.time()
        odf = con.sql(sql).df()
        t_oracle = round(time.time() - t0, 2)
        oh, orows, ocols = _hash(odf)
        post = calibrate_steal(n=3_000_000)
        res[f"t_{scale_tag}"] = t_spark
        res[f"t_oracle_{scale_tag}"] = t_oracle
        res[f"rows_{scale_tag}"] = srows
        res[f"eff_cores_{scale_tag}"] = round(
            min(pre["effective_cores"], post["effective_cores"]), 1)
        ok = (sh == oh) and (scols == ocols)
        res[f"hash_match_{scale_tag}"] = ok
        if not ok:
            res[f"oracle_rows_{scale_tag}"] = orows
        return ok

    n_bad = 0

    # ---- leg 1: relational heavy family, sfb (5k) then sf1 (50k) ----
    conb, con1 = _duck(SFB_DIR), _duck(SF1_DIR)
    con01 = _duck(SF01_DIR)
    for name in doc_names:
        res: dict = {}
        try:
            for sf_dir, con, tag in ((SFB_DIR, conb, "sfb"),
                                     (SF1_DIR, con1, "sf1")):
                if not leg(name, lambda: qs[name](spark, sf_dir),
                           osql[name], con, tag, res):
                    n_bad += 1
            res["growth"] = round(res["t_sf1"] / max(res["t_sfb"], 1e-9), 2)
        except Exception as e:  # noqa: BLE001
            res["err"] = f"{type(e).__name__}: {e}"
            n_bad += 1
        results[name] = res
        print(f"[{'OK ' if res.get('hash_match_sf1') else 'BAD'}] {name}: "
              f"{json.dumps(res, default=str)[:240]}")

    # ---- leg 2: corpus family over the 10x web ----
    if not skip_corpus:
        from crawler_news_spark.sources import hostsim as hs

        web1 = hs.corpus_web(scale=CORPUS_SCALE, wire_stories=CORPUS_WIRE)
        for name, semantic in (("corpus_build", False),
                               ("corpus_build_semantic", True)):
            if wanted and name not in wanted:
                continue
            res = {}
            try:
                # fixture-scale reference timing reuses the registry twin
                ok0 = leg(
                    name, lambda: qs[name](spark, SF01_DIR),
                    osql[name], con01, "fixture", res)
                # 10x: fresh Spark crawl+pipeline vs py-oracle-spans twin
                ok1 = leg(
                    name,
                    lambda: Q.corpus_build_stages(
                        spark, web=web1, semantic=semantic)["packed"],
                    Q._sql_corpus_build(semantic=semantic,
                                        spans_path=SPANS_SF1),
                    con01, "sf1", res)
                if not ok0 or not ok1:
                    n_bad += 1
                res["growth"] = round(
                    res["t_sf1"] / max(res["t_fixture"], 1e-9), 2)
            except Exception as e:  # noqa: BLE001
                res["err"] = f"{type(e).__name__}: {e}"
                n_bad += 1
            results[name] = res
            print(f"[{'OK ' if res.get('hash_match_sf1') else 'BAD'}] {name}:"
                  f" {json.dumps(res, default=str)[:240]}")

    out = {
        "sfb_dir": SFB_DIR,
        "sf1_dir": SF1_DIR,
        "n_docs": {"sfb": N_DOCS_B, "sf1": N_DOCS_1},
        "n_vecs": {"sfb": N_VECS_B, "sf1": N_VECS_1},
        "planted": {"exact_pair_rate": EXACT_DUP_RATE,
                    "near_dup_rate": NEAR_DUP_RATE,
                    "span_dup_rate": SPAN_DUP_RATE},
        "corpus_web_sf1": {"scale": CORPUS_SCALE,
                           "wire_stories": CORPUS_WIRE},
        "results": results,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"\n{len(results) - n_bad}/{len(results)} green -> {OUT_PATH}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
