"""Priority-frontier budget: top-K per host per wave, overflow defers,
nothing is lost, and the final output equals the unbudgeted crawl."""

import pytest

from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
from crawler_news_spark.sources import hostsim as hs

K = 40


def test_budgeted_crawl_defers_but_loses_nothing(spark, tmp_path_factory):
    web = hs.default_web()

    free = WaveCrawl(
        spark, web, str(tmp_path_factory.mktemp("free")),
        CrawlRunConfig(batch_pages=4, bloom_buckets=4),
    )
    free.run()
    want_urls = {r["url"] for r in free.articles_df().collect()}
    want_seen = {r["canonical_url"] for r in free.seen_df().collect()}

    capped = WaveCrawl(
        spark, web, str(tmp_path_factory.mktemp("capped")),
        CrawlRunConfig(batch_pages=4, bloom_buckets=4,
                       max_articles_per_host_wave=K),
    )
    capped.run()
    arts = capped.articles_df().collect()

    # budget respected per (host, wave)
    per = {}
    for r in arts:
        per[(r["host"], r["wave"])] = per.get((r["host"], r["wave"]), 0) + 1
    assert per and max(per.values()) <= K

    # overflow actually happened (fixture is large enough to exercise it)
    m = capped.cat.read_manifest()
    assert capped.cat.last_wave() > free.cat.last_wave()

    # nothing lost: identical article set and seen set
    assert {r["url"] for r in arts} == want_urls
    assert {r["canonical_url"] for r in capped.seen_df().collect()} == want_seen

    # priority honored: within (host, first capped wave), fetched articles
    # have priority >= every deferred one fetched later
    by_host_wave = {}
    for r in arts:
        by_host_wave.setdefault(r["host"], {}).setdefault(r["wave"], []).append(r)
    for host, waves in by_host_wave.items():
        ws = sorted(waves)
        for w1, w2 in zip(ws, ws[1:]):
            if w2 != w1 + 1 or len(waves[w1]) < K:
                continue
            # waves[w2] may mix deferred rows with newly discovered ones —
            # only compare the deferred ones (same type/page generation is
            # not distinguishable here, so just assert the budget shape)
            assert len(waves[w1]) == K
