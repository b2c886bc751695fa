"""End-to-end corpus-build flagship: crawl -> quality -> dedup -> near-dup
-> decontaminate -> pack, every stage verified to actually bite, and the
packed output pinned against the independent DuckDB/py-oracle replay.
"""

from __future__ import annotations

import collections

from crawler_news_spark import queries as Q
from crawler_news_spark.sources import hostsim as hs


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
    """Articles on DIFFERENT hosts carrying the same wire story have
    identical paragraph text (exact branch) or identical-plus-one-local-note
    (near-dup branch)."""
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
                    local = (h >> 8) % 3 != 0
                    by_wire[wire].append((spec.host, local, tuple(f["paragraphs"])))
    multi = {w: v for w, v in by_wire.items() if len(v) > 1}
    assert multi, "no wire story appeared twice in the sample"
    for w, arts in multi.items():
        # strip the local note (exactly one appended paragraph) and compare
        cores = [p[:-1] if local else p for _, local, p in arts]
        assert len({c for c in cores}) == 1, f"wire {w} bodies diverge"


def test_corpus_build_every_stage_bites(spark):
    stages = Q.corpus_build_stages(spark)
    n = {k: stages[k].count() for k in (
        "body", "bench", "corpus_raw", "corpus_quality", "corpus_exact",
        "corpus_neardup", "corpus_clean", "packed")}
    pairs = stages["near_dup_pairs"].count()
    contam = stages["contaminated"].count()

    assert n["body"] == n["bench"] + n["corpus_raw"]
    assert n["bench"] > 0
    assert n["corpus_quality"] < n["corpus_raw"]          # quality gate bites
    assert n["corpus_exact"] < n["corpus_quality"]        # exact dups removed
    assert pairs > 0                                      # LSH finds near-dups
    assert n["corpus_neardup"] < n["corpus_exact"]        # near-dups removed
    assert contam > 0                                     # eval contamination found
    assert n["corpus_clean"] < n["corpus_neardup"]        # decontamination bites
    assert n["packed"] == n["corpus_clean"]               # packing is 1:1
    # regression pin on the deterministic fixture (crawl of corpus_web)
    assert n["body"] == 323
    assert n["packed"] == 208


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
        (112, 110, 106, 80)


def test_cross_pairs_only_new_vs_old(spark):
    """lsh_cross_pairs never pairs within a side: doc_a comes from the new
    batch, doc_b from the existing corpus."""
    stages = Q.corpus_update_stages(spark)
    new_ids = {r["doc_id"] for r in stages["incoming_noexact"].collect()}
    old_ids = {r["doc_id"] for r in stages["existing"].collect()}
    for r in stages["cross_pairs"].collect():
        assert r["doc_a"] in new_ids and r["doc_b"] in old_ids
