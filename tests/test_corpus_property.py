"""Property test: the composed corpus_build pipeline equals an INDEPENDENT
pure-Python implementation on seeded RANDOM syndicated webs — guarding the
composition against overfitting to the one pinned corpus_web fixture.

The Python twin mirrors engine semantics exactly:
- regexes run with re.ASCII (\\b, \\w, \\s ASCII-only) because Java's default
  regex and DuckDB's RE2 are both ASCII for these classes, while Python's
  default is Unicode-aware — on Vietnamese text the flags MUST match;
- float expressions reproduce the Spark expression tree's operation order
  (IEEE754 doubles are deterministic given the same op order);
- string comparisons (min doc_id, doc_a < doc_b, packing sort) agree
  because UTF-8 byte order equals code-point order.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
import random
import re

import pytest

from crawler_news_spark import queries as Q
from crawler_news_spark.operators.dedup import (
    N_SIGS,
    minhash_sigs_py,
    shingle_set_py,
)
from crawler_news_spark.oracle.pyoracle import crawl_oracle
from crawler_news_spark.sources import hostsim as hs

WS = re.compile(r"\S+", re.ASCII)
EN = re.compile(r"\b(the|and|of|to|in)\b", re.ASCII)
NOT_PUNCT = re.compile(r"[^.,!?;:]")


def random_syndicated_web(seed: int) -> hs.WebConfig:
    rng = random.Random(seed)
    profiles = list(hs.PROFILES)
    hosts = []
    for i in range(rng.randint(3, 5)):
        prof = rng.choice(profiles)
        hosts.append(
            hs.HostSpec(
                f"rnd{i}.example.vn",
                prof,
                n_types=rng.randint(1, 4),
                links_per_page=rng.randint(3, 7),
                max_depth=rng.randint(1, 4),
                one_shot=(hs.PAGINATION[prof] == "one-shot"),
                crawl_delay_s=1.0,
            )
        )
    return hs.WebConfig(
        seed=seed,
        hosts=tuple(hosts),
        syndication_mod=rng.choice([2, 3]),
        wire_stories=rng.randint(4, 10),
    )


def doc_hash(doc_id: str) -> int:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:10], 16)


def quality_u_py(text: str) -> int:
    n = len(text)
    toks = float(len(WS.findall(text)))
    mean_word_len = float(n) / max(toks, 1.0)
    # punct_count = length after removing NON-punct chars
    punct = len(NOT_PUNCT.sub("", text))
    punct_ratio = float(punct) / max(float(n), 1.0)
    stop_ratio = float(len(EN.findall(text))) / max(toks, 1.0)
    score = (
        min(n / 500.0, 1.0) * 0.4
        + min(stop_ratio * 5.0, 1.0) * 0.3
        + (1.0 - min(punct_ratio * 10.0, 1.0)) * 0.2
        + min(mean_word_len / 8.0, 1.0) * 0.1
    )
    return int(math.floor(score * 1e6 + 0.5))


def dup3_u_py(words: list[str]) -> int:
    nw = len(words)
    if nw < 3:
        return 0
    grams = [" ".join(words[i : i + 3]) for i in range(nw - 2)]
    dup = 1.0 - float(len(set(grams))) / float(len(grams))
    return int(math.floor(dup * 1e6 + 0.5))


def corpus_build_py(bodies: dict[str, str]) -> list[tuple[str, int, int, int]]:
    """(doc_id, shard, tok, bin_id) — the whole pipeline in pure Python."""
    tagged = {d: (t, doc_hash(d)) for d, t in bodies.items()}
    bench = {d for d, (_t, h) in tagged.items() if h % Q.CB_BENCH_MOD == 0}
    corpus = sorted(d for d in tagged if d not in bench)

    # quality gate
    kept = []
    for d in corpus:
        text = tagged[d][0]
        w = WS.findall(text.strip())
        if (
            len(w) >= Q.CB_MIN_WORDS
            and quality_u_py(text) >= Q.CB_MIN_QUALITY_U
            and dup3_u_py(w) <= Q.CB_MAX_DUP3_U
        ):
            kept.append(d)

    # jusText-style boilerplate strip (a line in >= CB_BOILER_DF distinct
    # docs is removed everywhere) then C4-style keep-first line dedup
    # (corpus-wide, ordered by (doc_id, idx)), then reassembly — docs that
    # lose every line drop out
    doc_lines = {d: tagged[d][0].split("\n") for d in kept}
    line_docs: dict[str, set] = {}
    for d in kept:
        for ln in set(doc_lines[d]):
            line_docs.setdefault(ln, set()).add(d)
    boiler = {ln for ln, ds in line_docs.items() if len(ds) >= Q.CB_BOILER_DF}
    seen_lines: set[str] = set()
    cleaned: dict[str, str] = {}
    for d in sorted(kept):
        out_lines = []
        for ln in doc_lines[d]:
            if ln in boiler or ln in seen_lines:
                continue
            seen_lines.add(ln)
            out_lines.append(ln)
        if out_lines:
            cleaned[d] = "\n".join(out_lines)

    # exact dedup: min doc_id per md5(cleaned body)
    by_hash: dict[str, str] = {}
    for d in cleaned:
        hh = hashlib.md5(cleaned[d].encode()).hexdigest()
        if hh not in by_hash or d < by_hash[hh]:
            by_hash[hh] = d
    corpus2 = sorted(by_hash.values())

    # minhash near-dup removal (drop doc_b of every thresholded pair)
    sigs = {d: minhash_sigs_py(cleaned[d]) for d in corpus2}
    shingles = {d: shingle_set_py(cleaned[d]) for d in corpus2}
    drops = set()
    for i, a in enumerate(corpus2):
        for b in corpus2[i + 1 :]:
            sa, sb = sigs[a], sigs[b]
            band_hit = any(
                sa[2 * k] == sb[2 * k] and sa[2 * k + 1] == sb[2 * k + 1]
                for k in range(N_SIGS // 2)
            )
            if not band_hit:
                continue
            if sum(x == y for x, y in zip(sa, sb)) < 3:
                continue
            inter = len(shingles[a] & shingles[b])
            denom = len(shingles[a]) + len(shingles[b]) - inter
            j_u = int(math.floor(inter * 1e6 / denom + 0.5))
            if j_u >= Q.CB_JACCARD_U:
                drops.add(b)
    corpus3 = [d for d in corpus2 if d not in drops]

    # decontamination vs the bench 5-gram set (bench keeps its RAW text —
    # line cleaning applies to the training corpus only)
    def grams5(text: str) -> set[str]:
        w = WS.findall(text.strip())
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    bench_set = set()
    for d in bench:
        bench_set |= grams5(tagged[d][0])
    corpus4 = [
        d for d in corpus3 if len(grams5(cleaned[d]) & bench_set) < Q.CB_MIN_SHARED
    ]

    # packing
    n = len(corpus4)
    n_shards = max(1, n // Q.CB_DOCS_PER_SHARD)
    rows = []
    per_shard: dict[int, list[tuple[int, str, int]]] = {}
    for d in corpus4:
        h = doc_hash(d)
        tok = len(WS.findall(cleaned[d].strip()))
        per_shard.setdefault(h % n_shards, []).append((h, d, tok))
    for shard, items in per_shard.items():
        cum = 0
        for h, d, tok in sorted(items):
            rows.append((d, shard, tok, cum // Q.CB_PACK_BUDGET))
            cum += tok
    return sorted(rows)


@pytest.mark.parametrize("seed", [11, 47])
def test_corpus_build_matches_python_on_random_webs(spark, seed):
    web = random_syndicated_web(seed)
    res = crawl_oracle(web, batch_pages=3)
    bodies = {
        d: "\n".join(s["text"] for s in spans if s["kind"] == "text")
        for d, spans in res.documents.items()
    }
    expected = corpus_build_py(bodies)
    assert len(expected) > 0, "seed produced an empty corpus — pick another"

    got = sorted(
        (r["doc_id"], r["shard"], r["tok"], r["bin_id"])
        for r in Q.corpus_build_stages(spark, web=web)["packed"].collect()
    )
    assert got == expected
