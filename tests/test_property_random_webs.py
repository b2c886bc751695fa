"""Property test: for seeded random web configurations, the engine equals
the oracle on seen set, crawl order, and span sequences; invariants hold
(SURVEY.md §5.3): offsets dense, no URL fetched twice, seen ⊇ outputs."""

import random

import pytest

from crawler_news_spark.oracle.pyoracle import crawl_oracle
from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
from crawler_news_spark.sources import hostsim as hs


def random_web(seed: int) -> hs.WebConfig:
    rng = random.Random(seed)
    profiles = list(hs.PROFILES)
    hosts = []
    for i in range(rng.randint(2, 4)):
        prof = rng.choice(profiles)
        hosts.append(
            hs.HostSpec(
                f"rnd{i}.example.vn",
                prof,
                n_types=rng.randint(1, 5),
                links_per_page=rng.randint(2, 7),
                max_depth=rng.randint(1, 5),
                page_cap=rng.choice([None, None, 3]),
                # selenium-only profiles have no paged-URL form and
                # must be one_shot (WebConfig validates this)
                one_shot=(hs.PAGINATION[prof] == "one-shot"
                          or rng.random() < 0.2),
                crawl_delay_s=rng.choice([0.5, 1.0, 2.0]),
                robots_disallow=rng.choice([(), ("/tag",)]),
            )
        )
    return hs.WebConfig(seed=seed, hosts=tuple(hosts))


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_web_engine_equals_oracle(spark, tmp_path_factory, seed):
    web = random_web(seed)
    batch = random.Random(seed).randint(2, 5)
    oracle = crawl_oracle(web, batch_pages=batch)

    wc = WaveCrawl(
        spark, web, str(tmp_path_factory.mktemp(f"rnd{seed}")),
        CrawlRunConfig(batch_pages=batch, bloom_buckets=4),
    )
    wc.run()

    assert {r["canonical_url"] for r in wc.seen_df().collect()} == oracle.seen
    arts = wc.articles_df().orderBy("crawl_order").collect()
    assert [r["url"] for r in arts] == oracle.crawl_order
    # no URL fetched twice
    assert len({r["url"] for r in arts}) == len(arts)
    # span sequences + dense offsets
    docs = {r["doc_id"]: r["spans"] for r in wc.documents_df().collect()}
    assert set(docs) == set(oracle.documents)
    for doc_id, spans in docs.items():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in oracle.documents[doc_id]]
        assert got == want, doc_id
        assert [s[3] for s in got] == list(range(len(got)))
    # seen ⊇ crawled outputs
    assert {r["url"] for r in arts} <= oracle.seen
