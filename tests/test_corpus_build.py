"""End-to-end corpus-build flagship: crawl -> quality -> dedup -> near-dup
-> decontaminate -> pack, every stage verified to actually bite, and the
packed output pinned against the independent DuckDB/py-oracle replay.
"""

from __future__ import annotations

import collections

from crawler_news_spark import queries as Q
from crawler_news_spark.sources import hostsim as hs

# deterministic corpus_web fixture pins (r07: 4 syndication branches)
CORPUS_UPDATE_PINS = (112, 111, 109, 88)  # day2, incoming, noexact, accepted


def test_syndication_off_by_default():
    """default_web must be byte-identical with syndication off — the
    flagship crawl oracle depends on it."""
    web = hs.default_web(scale=0.5)
    assert web.syndication_mod == 0
    f = hs.article_fields(web, "vnx1.example.vn",
                          "https://vnx1.example.vn/tin-0/bai-viet-1.html")
    # per-URL keying: paragraphs mention their own index and differ per doc
    assert all(p.startswith("Đoạn ") for p in f["paragraphs"])


def test_syndicated_articles_share_wire_bodies():
    """Articles on DIFFERENT hosts carrying the same wire story come in
    four republication modes: byte-identical (branch 0), identical plus
    one local note (branch 1), per-line lightly edited (branch 2 — every
    line differs from the wire original, but each line is the original with
    a short editorial suffix, so shingle overlap stays high), or fully
    PARAPHRASED (branch 3 — every word swapped for its reversed-surface
    synonym and the order reshuffled, so no char-5-gram shingles survive;
    only the semantic rung can see it)."""
    web = hs.corpus_web()
    by_wire = collections.defaultdict(list)
    for spec in web.hosts[:10]:
        for t in range(spec.n_types):
            for i in range(1, 6):
                url = hs.article_url(web, spec.host, t, i)
                cu = hs._canonical_article(web, spec.host, url)
                h = hs.stable_hash(f"doc|{cu}", web.seed)
                if h % web.syndication_mod == 0:
                    f = hs.article_fields(web, spec.host, url)
                    wire = (h >> 4) % web.wire_stories
                    branch = (h >> 8) % web.wire_branches
                    by_wire[wire].append((spec.host, branch, tuple(f["paragraphs"])))
    multi = {w: v for w, v in by_wire.items() if len(v) > 1}
    assert multi, "no wire story appeared twice in the sample"

    def canon_bag(line: str) -> frozenset:
        # synonym-class bag: prefix + punctuation-stripped least(w, rev(w))
        pre, _, body = line.partition(": ")
        toks = [t.translate(str.maketrans("", "", ".,:")) for t in body.split()]
        return (pre, frozenset(min(t, t[::-1]) for t in toks))

    seen_branches = set()
    for w, arts in multi.items():
        # branch 0/1 copies share the byte-identical wire core (branch 1
        # appends exactly one local note)
        cores = [p[:-1] if branch == 1 else p
                 for _, branch, p in arts if branch in (0, 1)]
        assert len({c for c in cores}) <= 1, f"wire {w} bodies diverge"
        if cores:
            core = cores[0]
            for _, branch, p in arts:
                if branch == 2:
                    assert len(p) == len(core)
                    # every line edited, but only by an appended suffix
                    for edited, orig in zip(p, core):
                        assert edited != orig
                        assert edited.startswith(orig[:-1])
                elif branch == 3:
                    assert len(p) == len(core)
                    for para, orig in zip(p, core):
                        assert para != orig
                        # no 5-char shingle survives beyond the 'Đoạn i: '
                        # prefix — LSH-invisible by construction
                        o_body = orig.partition(": ")[2]
                        p_body = para.partition(": ")[2]
                        shingles = {o_body[i:i + 5]
                                    for i in range(len(o_body) - 4)}
                        overlap = sum(p_body[i:i + 5] in shingles
                                      for i in range(len(p_body) - 4))
                        assert overlap <= 2, (para, orig)
                        # ... but the synonym-class bag differs by exactly
                        # the one spliced interjection word
                        pb, ob = canon_bag(para), canon_bag(orig)
                        assert pb[0] == ob[0]
                        assert len(pb[1] - ob[1]) <= 1 and ob[1] <= pb[1]
        seen_branches.update(b for _, b, _p in arts)
    assert seen_branches == {0, 1, 2, 3}, f"missing branches: {seen_branches}"


def test_corpus_build_every_stage_bites(spark):
    stages = Q.corpus_build_stages(spark)
    n = {k: stages[k].count() for k in (
        "body", "bench", "corpus_raw", "corpus_quality", "lines",
        "lines_noboiler", "lines_clean", "corpus_lineclean", "corpus_exact",
        "corpus_neardup", "corpus_clean", "packed")}
    pairs = stages["near_dup_pairs"].count()
    contam = stages["contaminated"].count()

    assert n["body"] == n["bench"] + n["corpus_raw"]
    assert n["bench"] > 0
    assert n["corpus_quality"] < n["corpus_raw"]          # quality gate bites
    assert n["lines_noboiler"] < n["lines"]               # boilerplate bites
    assert n["lines_clean"] < n["lines_noboiler"]         # line dedup bites
    # line stages drop the docs they empty (exact wire copies lose every
    # line to keep-first; >=3-copy wire bodies are boilerplate wholesale)
    assert n["corpus_lineclean"] < n["corpus_quality"]
    # exact dedup is provably subsumed by corpus-wide keep-first line
    # dedup: any byte-identical pair of docs has byte-identical lines, so
    # the higher-id copy loses every line and vanishes at reassembly.  The
    # stage remains as a guard against post-cleaning text collisions.
    assert n["corpus_exact"] == n["corpus_lineclean"]
    # the in-line-perturbed syndication branch (hostsim branch 2) shares no
    # byte-identical LINES with its wire siblings, so it rides through the
    # line stages untouched — only doc-level shingle LSH catches it
    assert pairs > 0                                      # LSH finds near-dups
    assert n["corpus_neardup"] < n["corpus_exact"]        # near-dups removed
    assert contam > 0                                     # eval contamination found
    assert n["corpus_clean"] < n["corpus_neardup"]        # decontamination bites
    assert n["packed"] == n["corpus_clean"]               # packing is 1:1
    # regression pin on the deterministic fixture (crawl of corpus_web —
    # since r07 the web plants a 4th, PARAPHRASED syndication branch, which
    # shares no lines/shingles and therefore rides through every stage here)
    assert n["body"] == 323
    assert (n["lines"], n["lines_noboiler"], n["lines_clean"]) == (1242, 1048, 1030)
    assert (n["corpus_lineclean"], n["corpus_neardup"], n["packed"]) == (267, 253, 248)


def test_corpus_build_semantic_stage_bites(spark):
    """The optional 11th stage (SemDeDup over the centered synonym-class
    embedding) removes exactly the planted PARAPHRASED republications —
    docs the LSH stage is structurally blind to (no shared shingles)."""
    stages = Q.corpus_build_stages(spark, semantic=True)
    n3 = stages["corpus_neardup"].count()
    n3s = stages["corpus_semantic"].count()
    packed = stages["packed"].count()
    assert n3s < n3                       # the semantic rung bites ...
    # ... and catches what LSH could not: pinned on the deterministic fixture
    assert (n3, n3s, packed) == (253, 237, 232)
    # with the stage off, corpus_semantic is pass-through
    off = Q.corpus_build_stages(spark, semantic=False)
    assert off["corpus_semantic"].count() == off["corpus_neardup"].count() == 253
    # specificity: everything the semantic rung drops is a planted wire-
    # syndication doc (it never removes organic articles), and the planted
    # PARAPHRASED branch is represented among the drops
    web = hs.corpus_web()
    kept_ids = {r["doc_id"] for r in stages["corpus_semantic"].collect()}
    dropped = {r["doc_id"] for r in stages["corpus_neardup"].collect()} - kept_ids
    assert len(dropped) == 253 - 237
    branches = {}
    for cu in dropped:
        h = hs.stable_hash(f"doc|{cu}", web.seed)
        assert h % web.syndication_mod == 0, f"organic doc dropped: {cu}"
        branches[cu] = (h >> 8) % web.wire_branches
    assert 3 in set(branches.values()), "no paraphrased doc among drops"


def test_corpus_build_matches_duckdb_oracle(spark):
    import duckdb

    got = (
        Q.q_corpus_build(spark, "")
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(Q._sql_corpus_build())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["doc_id", "shard", "tok", "bin_id"]
    got = got[exp.columns]
    assert got.equals(exp.astype(got.dtypes.to_dict()))
    # packing invariant, recomputed from scratch: within each shard in
    # (h_u, doc_id) order, bin = preceding-cumulative-tokens div budget
    import hashlib

    h_u = got["doc_id"].map(
        lambda d: int(hashlib.md5(d.encode()).hexdigest()[:10], 16)
    )
    chk = got.assign(h_u=h_u).sort_values(["shard", "h_u", "doc_id"])
    for _, grp in chk.groupby("shard"):
        start = grp["tok"].cumsum() - grp["tok"]
        assert (start // Q.CB_PACK_BUDGET == grp["bin_id"]).all()


def test_corpus_update_every_stage_bites(spark):
    """Incremental day-2 ingest: within-batch exact dedup, cross-exact
    fingerprint drop, and the cross-LSH near-dup drop each remove rows."""
    stages = Q.corpus_update_stages(spark)
    n = {k: stages[k].count() for k in (
        "day1", "day2", "existing", "incoming", "incoming_noexact", "accepted")}
    cross = stages["cross_pairs"].count()

    assert n["existing"] < n["day1"]            # wire copies inside day 1
    assert n["incoming"] < n["day2"]            # within-batch exact dups
    assert n["incoming_noexact"] < n["incoming"]  # exact copies of existing
    assert cross > 0                            # cross near-dups found
    assert n["accepted"] < n["incoming_noexact"]  # near-dups dropped
    # regression pin on the deterministic fixture
    assert (n["day2"], n["incoming"], n["incoming_noexact"], n["accepted"]) == \
        CORPUS_UPDATE_PINS


def test_cross_pairs_only_new_vs_old(spark):
    """lsh_cross_pairs never pairs within a side: doc_a comes from the new
    batch, doc_b from the existing corpus."""
    stages = Q.corpus_update_stages(spark)
    new_ids = {r["doc_id"] for r in stages["incoming_noexact"].collect()}
    old_ids = {r["doc_id"] for r in stages["existing"].collect()}
    for r in stages["cross_pairs"].collect():
        assert r["doc_a"] in new_ids and r["doc_b"] in old_ids


def test_line_dedup_invariants(spark):
    """C4-style line dedup: exactly one survivor per distinct line; exact
    wire copies lose every line (empty clean_hash)."""
    out = Q.q_line_dedup(spark, "").collect()
    assert len(out) == 323
    kept = sum(r["n_kept"] for r in out)
    dropped = sum(r["n_dropped"] for r in out)
    assert dropped == 189                      # pinned fixture duplication
    # distinct lines across the corpus == survivors
    bodies = Q._corpus_bodies(spark).collect()
    distinct = len({ln for r in bodies for ln in r["text"].split("\n")})
    assert kept == distinct
    import hashlib
    empty_md5 = hashlib.md5(b"").hexdigest()
    emptied = [r for r in out if r["n_kept"] == 0]
    assert emptied and all(r["clean_hash"] == empty_md5 for r in emptied)


def test_boilerplate_strip_invariants(spark):
    """df>=3 lines are stripped EVERYWHERE (no survivors, unlike
    keep-first line dedup)."""
    out = {r["doc_id"]: r for r in Q.q_boilerplate_strip(spark, "").collect()}
    assert len(out) == 323
    assert sum(r["n_stripped"] for r in out.values()) == 234
    bodies = Q._corpus_bodies(spark).collect()
    from collections import Counter
    df = Counter()
    for r in bodies:
        for ln in set(r["text"].split("\n")):
            df[ln] += 1
    boiler = {ln for ln, c in df.items() if c >= 3}
    for r in bodies:
        lines = r["text"].split("\n")
        expect_kept = [ln for ln in lines if ln not in boiler]
        assert out[r["doc_id"]]["n_kept"] == len(expect_kept)


def test_corpus_stage_counts_consistent(spark):
    """The stage-count observability query agrees with the stages dict and
    is monotone along each unit's pipeline axis."""
    rows = {r["stage"]: r for r in
            Q.q_corpus_stage_counts(spark, "").collect()}
    assert [r for r in sorted(rows.values(), key=lambda r: r["stage_no"])]
    n = {k: rows[k]["n"] for k in rows}
    assert n["body"] == n["bench"] + n["corpus_raw"]
    assert n["lines"] > n["lines_noboiler"] > n["lines_clean"]
    assert (n["corpus_quality"] > n["corpus_lineclean"] >= n["corpus_exact"]
            > n["corpus_neardup"] > n["corpus_clean"] == n["packed"])
    assert rows["lines"]["unit"] == "lines" and rows["packed"]["unit"] == "docs"
