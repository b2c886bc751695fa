"""End-to-end wave-crawl equality vs the pure-Python oracle.

The north-rule gates: span-sequence equality on (kind, text, media_ref,
order) per document, identical crawl ordering, identical final URL-seen set,
politeness spacing, per-partition lineage, exact resume from checkpoint.
"""

import pytest

from crawler_news_spark.oracle.pyoracle import crawl_oracle
from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
from crawler_news_spark.sources import hostsim as hs

BATCH = 4


@pytest.fixture(scope="module")
def web():
    return hs.default_web()


@pytest.fixture(scope="module")
def oracle(web):
    return crawl_oracle(web, batch_pages=BATCH)


@pytest.fixture(scope="module")
def engine(spark, web, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cat"))
    wc = WaveCrawl(spark, web, root, CrawlRunConfig(batch_pages=BATCH, bloom_buckets=4))
    wc.run()
    return wc


def test_seen_set_exact(engine, oracle):
    got = {r["canonical_url"] for r in engine.seen_df().collect()}
    assert got == oracle.seen


def test_crawl_order_exact(engine, oracle):
    arts = engine.articles_df().orderBy("crawl_order").collect()
    assert [r["url"] for r in arts] == oracle.crawl_order


def test_article_records_exact(engine, oracle):
    """Every output field matches the oracle record byte-for-byte."""
    got = {r["url"]: r.asDict() for r in engine.articles_df().collect()}
    assert len(got) == len(oracle.articles)
    fields = [
        "dataSource", "publishedDate", "author", "title", "imageUrl",
        "description", "content", "comments", "contentImageUrls", "article_type",
    ]
    for rec in oracle.articles:
        g = got[rec["url"]]
        for f in fields:
            assert g[f] == rec[f], (rec["url"], f, g[f], rec[f])


def test_span_sequences_exact(engine, oracle):
    """(kind, text, media_ref, order) per row — the input_hint invariant."""
    docs = engine.documents_df().collect()
    assert len(docs) == len(oracle.documents)
    for row in docs:
        want = oracle.documents[row["doc_id"]]
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want]
        assert got == exp, row["doc_id"]
        # offsets dense 0..n-1
        assert [s["offset"] for s in row["spans"]] == list(range(len(got)))


def test_politeness_schedule_exact(engine, oracle, web):
    """Article fetch_ts matches the oracle's virtual clock exactly, and
    consecutive fetches on a host are spaced >= crawl_delay_s."""
    want = {
        (r["host"], r["wave"], r["type_id"], r["page_no"], r["link_index"]):
            r["fetch_ts"]
        for r in oracle.fetch_schedule
        if r["kind"] == "article"
    }
    got_rows = engine.schedule_df().collect()
    by_host: dict[str, list[float]] = {}
    for r in got_rows:
        key = (r["host"], r["wave"], r["type_id"], r["page_no"], r["link_index"])
        assert key in want
        assert abs(r["fetch_ts"] - want[key]) < 1e-9, key
        by_host.setdefault(r["host"], []).append(r["fetch_ts"])
    delays = {s.host: s.crawl_delay_s for s in web.hosts}
    for host, ts in by_host.items():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            assert b - a >= delays[host] - 1e-9


def test_robots_never_fetched(engine, oracle, web):
    """No seen/crawled URL matches a robots Disallow prefix."""
    for r in engine.seen_df().collect():
        cu = r["canonical_url"]
        host = cu.split("/")[2]
        spec = web.spec(host)
        path = cu.split(host, 1)[1]
        assert not any(path.startswith(p) for p in spec.robots_disallow), cu


def test_lineage_counts(engine, oracle):
    """Lineage fetch/parse/error counters reconcile with the oracle's."""
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0, 0])
    for l in oracle.lineage:
        w = want[(l["wave"], l["host"])]
        w[0] += l["n_fetched"]
        w[1] += l["n_parsed"]
        w[2] += l["n_errors"]
    got = engine.lineage_df().collect()
    for r in got:
        w = want[(r["wave"], r["host"])]
        assert [r["n_fetched"], r["n_parsed"], r["n_errors"]] == w, (r["wave"], r["host"])


def test_bloom_no_false_negatives_e2e(engine):
    """Bloom-recovered FP count is recorded; the exact seen set already proved
    no URL was lost — here we assert the manifest exposes the FP metric."""
    m = engine.cat.read_manifest()
    assert all("n_bloom_fp" in w for w in m["waves"].values())


def test_resume_crash_mid_wave(spark, web, oracle, tmp_path_factory):
    """Crash AFTER a wave's snapshot writes but BEFORE its commit: the
    crashed wave's uncommitted seen delta must not anti-join the re-run
    wave's own discoveries out of the frontier (exact-resume guarantee)."""
    root = str(tmp_path_factory.mktemp("cat_crash"))
    cfg = CrawlRunConfig(batch_pages=BATCH, bloom_buckets=4)

    class CrashBeforeCommit(WaveCrawl):
        def _run_wave(self, wave, frontier, clock_base, totals_hint=None):
            if wave == 1:
                def boom(w, stats):  # all wave-1 writes landed; commit didn't
                    raise KeyboardInterrupt
                self.cat.commit_wave = boom
            return super()._run_wave(wave, frontier, clock_base, totals_hint)

    wc1 = CrashBeforeCommit(spark, web, root, cfg)
    with pytest.raises(KeyboardInterrupt):
        wc1.run()
    assert wc1.cat.last_wave() == 0  # wave 1 never committed
    # crash debris exists at wave 1 (this is the scenario under test):
    # the uncommitted seen delta that used to poison the resume anti-join
    import os
    assert os.path.exists(os.path.join(root, "seen", "wave-1"))

    wc2 = WaveCrawl(spark, web, root, cfg)
    wc2.run(resume=True)
    arts = wc2.articles_df().orderBy("crawl_order").collect()
    assert [r["url"] for r in arts] == oracle.crawl_order
    assert {r["canonical_url"] for r in wc2.seen_df().collect()} == oracle.seen


def test_resume_exact(spark, web, oracle, tmp_path_factory):
    """Kill after wave 1, resume, final state identical to a full run."""
    root = str(tmp_path_factory.mktemp("cat_resume"))
    cfg = CrawlRunConfig(batch_pages=BATCH, bloom_buckets=4)

    class StopAfter(WaveCrawl):
        def _run_wave(self, wave, frontier, clock_base, totals_hint=None):
            out = super()._run_wave(wave, frontier, clock_base, totals_hint)
            if wave == 1:
                raise KeyboardInterrupt
            return out

    wc1 = StopAfter(spark, web, root, cfg)
    with pytest.raises(KeyboardInterrupt):
        wc1.run()
    assert wc1.cat.last_wave() == 1

    wc2 = WaveCrawl(spark, web, root, cfg)
    wc2.run(resume=True)
    arts = wc2.articles_df().orderBy("crawl_order").collect()
    assert [r["url"] for r in arts] == oracle.crawl_order
    got = {r["canonical_url"] for r in wc2.seen_df().collect()}
    assert got == oracle.seen


def test_images_metadata_table(engine, oracle):
    """S7/images: one row per content image, reference path shape
    (vnexpress.py:117-128 / :162-167), counts match the oracle's records."""
    rows = engine.images_df().collect()
    want = sum(len(r["contentImageUrls"]) for r in oracle.articles)
    assert len(rows) == want and want > 0
    by_art = {}
    for r in rows:
        by_art.setdefault(r["article_url"], []).append(r)
    for rec in oracle.articles:
        got = sorted(by_art.get(rec["url"], []), key=lambda r: r["img_index"])
        assert [r["image_url"] for r in got] == rec["contentImageUrls"]
        for r in got:
            assert r["local_path"].startswith("/mnt/data/news/" + r["host"] + "/")
            base = r["image_url"].split("?")[0].rsplit("/", 1)[1]
            assert r["local_path"].endswith("/" + base)
            assert 20_000 <= r["n_bytes"] < 500_000


def test_robots_rules_come_from_fetched_robots_txt(spark, web):
    """north_rule: the engine's disallow rules + crawl delays are parsed
    from robots.txt fetched through the same fetch path as every page —
    and round-trip the config exactly."""
    from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
    import tempfile

    wc = WaveCrawl(spark, web, tempfile.mkdtemp(prefix="robots_"),
                   CrawlRunConfig(batch_pages=BATCH))
    # the robots state lives in a DataFrame (never host-indexed driver
    # dicts) — collect here is test-side only
    got = {r["host"]: (tuple(r["disallow"]), r["crawl_delay_s"])
           for r in wc.robots_df.collect()}
    assert {h: d for h, (d, _) in got.items()} == {
        s.host: tuple(s.robots_disallow) for s in web.hosts
    }
    assert {h: d for h, (_, d) in got.items()} == {
        s.host: s.crawl_delay_s for s in web.hosts
    }
    # the fetch path really serves robots.txt
    txt = hs.fetch(web, f"https://{web.hosts[0].host}/robots.txt")
    assert txt.startswith("User-agent: *")
    assert any(l.startswith("Crawl-delay: ") for l in txt.splitlines())
