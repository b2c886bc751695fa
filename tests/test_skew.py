"""Skew: one host with ~100x the URLs must neither break correctness nor
serialize the politeness/window stages into one hot task.

The politeness sequence is computed per (host, kind, type_id) window +
broadcast offsets (operators/politeness.py) — parallelism scales with
categories, so the giant host spreads over its 40 type partitions.
"""

import pytest

from crawler_news_spark.oracle.pyoracle import crawl_oracle
from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
from crawler_news_spark.sources import hostsim as hs


@pytest.fixture(scope="module")
def web():
    return hs.skewed_web(giant_types=24, giant_depth=8)


def test_skewed_crawl_exact(spark, web, tmp_path_factory):
    oracle = crawl_oracle(web, batch_pages=4)
    counts = {}
    for u in oracle.seen:
        h = u.split("/")[2]
        counts[h] = counts.get(h, 0) + 1
    # fixture really is skewed
    assert counts["giant.example.vn"] > 50 * counts.get("tiny1.example.vn", 1)

    root = str(tmp_path_factory.mktemp("cat_skew"))
    wc = WaveCrawl(spark, web, root, CrawlRunConfig(batch_pages=4, bloom_buckets=4))
    wc.run()
    arts = wc.articles_df().orderBy("crawl_order").collect()
    assert [r["url"] for r in arts] == oracle.crawl_order
    assert {r["canonical_url"] for r in wc.seen_df().collect()} == oracle.seen

    # politeness spacing still exact on the giant host
    delays = {s.host: s.crawl_delay_s for s in web.hosts}
    ts = sorted(r["fetch_ts"] for r in arts if r["host"] == "giant.example.vn")
    assert all(b - a >= delays["giant.example.vn"] - 1e-9 for a, b in zip(ts, ts[1:]))
