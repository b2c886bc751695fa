"""Re-crawl surface: seen-set eviction + on-demand request injection.

Mirrors the reference's daily cron re-run (cronjobs/cron_job.py) and the
POST /crawl on-demand path (app/crawl_request.py) — evicted URLs become
crawlable again; injected article requests are fetched on the next resumed
wave; duplicates of still-seen URLs are dropped.
"""

import pytest

from pyspark.sql import functions as F

from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
from crawler_news_spark.sources import hostsim as hs


@pytest.fixture()
def crawled(spark, tmp_path):
    web = hs.default_web(scale=0.5)
    wc = WaveCrawl(spark, web, str(tmp_path / "cat"),
                   CrawlRunConfig(batch_pages=4, bloom_buckets=4))
    wc.run()
    return wc


def _req_rows(spark, urls):
    return spark.createDataFrame(
        [(u.split("/")[2], "article", 0, 1, i, u) for i, u in enumerate(urls)],
        "host string, kind string, type_id int, page_no int, link_index int, url string",
    )


def test_inject_seen_duplicate_is_dropped(spark, crawled):
    wc = crawled
    seen_url = wc.articles_df().select("url").first()["url"]
    n = wc.inject_requests(_req_rows(spark, [seen_url]))
    assert n == 0  # already seen -> dropped


def test_evict_then_inject_recrawls(spark, crawled):
    wc = crawled
    before = wc.articles_df().collect()
    targets = sorted({r["url"] for r in before})[:3]
    last_before = wc.cat.last_wave()

    assert wc.evict_seen(targets) == 3
    assert wc.inject_requests(_req_rows(spark, targets)) == 3
    wc.run(resume=True)

    after = wc.articles_df().collect()
    assert len(after) == len(before) + 3
    recrawled = [r for r in after if r["wave"] > last_before]
    assert sorted(r["url"] for r in recrawled) == targets
    # re-crawl is deterministic: same parsed record as the first crawl
    first = {r["url"]: r for r in before if r["url"] in targets}
    for r in recrawled:
        for f in ("title", "content", "publishedDate", "author"):
            assert r[f] == first[r["url"]][f]


def test_inject_same_url_twice_crawls_once(spark, crawled):
    """Two micro-batches (separate inject calls) and an in-batch duplicate
    carrying the same unseen URL must yield exactly one frontier row and one
    article (the second call anti-joins against the first call's tagged
    seen delta; in-batch dups collapse by keep-first)."""
    wc = crawled
    web = wc.web
    spec = web.hosts[0]
    url = hs.article_url(web, spec.host, 0, 20_000)
    # in-batch duplicate: same URL at two link indexes -> one injected row
    assert wc.inject_requests(_req_rows(spark, [url, url])) == 1
    # second micro-batch with the same URL before any run -> dropped
    assert wc.inject_requests(_req_rows(spark, [url])) == 0
    wc.run(resume=True)
    got = wc.articles_df().filter(F.col("url") == url).collect()
    assert len(got) == 1


def test_inject_unseen_article(spark, crawled):
    wc = crawled
    # an article URL the crawl never discovered (deep index)
    web = wc.web
    spec = web.hosts[0]
    url = hs.article_url(web, spec.host, 0, 10_000)
    assert wc.inject_requests(_req_rows(spark, [url])) == 1
    wc.run(resume=True)
    got = wc.articles_df().filter(F.col("url") == url).collect()
    assert len(got) == 1
    # and it is now seen: a second injection is dropped
    assert wc.inject_requests(_req_rows(spark, [url])) == 0


def test_remove_duplicate_articles_storage_delete(spark, crawled):
    """Storage-level keep-first delete (remove_record_duplicate.py:25-57):
    re-crawled URLs produce duplicate rows; the delete rewrites the affected
    wave snapshots keeping the earliest crawl of each URL."""
    wc = crawled
    before = wc.articles_df().collect()
    targets = sorted({r["url"] for r in before})[:2]
    orig_wave = {r["url"]: r["wave"] for r in before if r["url"] in targets}
    assert wc.evict_seen(targets) == 2
    assert wc.inject_requests(_req_rows(spark, targets)) == 2
    wc.run(resume=True)
    assert wc.articles_df().count() == len(before) + 2  # dups exist

    assert wc.remove_duplicate_articles(["url"]) == 2
    after = wc.articles_df().collect()
    assert len(after) == len(before)
    by_url = {r["url"]: r for r in after}
    assert len(by_url) == len(after)  # no dup urls remain
    for u in targets:
        assert by_url[u]["wave"] == orig_wave[u]  # first crawl kept
    # idempotent: second pass deletes nothing
    assert wc.remove_duplicate_articles(["url"]) == 0


def test_remove_duplicates_keep_last(spark, crawled):
    """keep='last' retains the most recent crawl (replace semantics)."""
    wc = crawled
    before = wc.articles_df().collect()
    targets = sorted({r["url"] for r in before})[4:6]
    orig_wave = {r["url"]: r["wave"] for r in before if r["url"] in targets}
    assert wc.evict_seen(targets) == 2
    assert wc.inject_requests(_req_rows(spark, targets)) == 2
    wc.run(resume=True)
    assert wc.remove_duplicate_articles(["url"], keep="last") == 2
    after = {r["url"]: r for r in wc.articles_df().collect()}
    for u in targets:
        assert after[u]["wave"] > orig_wave[u]  # the NEW crawl kept
