"""The mapInArrow article vUDF must be row-identical to the mapInPandas one.

The A/B harness (scripts/ab_parse_arrow.py) measures which is faster; this
test pins that they are interchangeable — same rows, same values, same
null/parse_ok placement — so whichever wins the A/B can be swapped in
without moving the crawl_flagship hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _frontier(spark, web):
    from crawler_news_spark.functions.urlnorm import (
        canonical_hash_col,
        canonicalize_col,
    )
    from crawler_news_spark.operators import parse as P

    listings = spark.createDataFrame(
        [(s.host, t, 0) for s in web.hosts for t in range(s.n_types)],
        "host string, type_id int, page_no int",
    )
    return (
        P.fetch_parse_listings(web, listings)
        .select("host", "type_id", "page_no",
                F.explode("out_links").alias("url"))
        .select(
            F.lit(1).alias("wave"),
            "host",
            "type_id",
            "page_no",
            F.lit(0).alias("link_index"),
            canonicalize_col(F.col("url")).alias("canonical_url"),
        )
        .withColumn("canonical_hash",
                    canonical_hash_col(F.col("canonical_url")))
        .withColumn("fetch_ts", F.lit(0.0))
        .dropDuplicates(["canonical_hash"])
    )


def test_arrow_and_pandas_article_parse_identical(spark):
    from crawler_news_spark.operators import parse as P
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web(scale=0.5)
    frontier = _frontier(spark, web).persist()
    try:
        a = P.fetch_parse_articles(web, frontier)
        b = P.fetch_parse_articles_arrow(web, frontier)
        assert a.schema == b.schema
        ok_idx = a.columns.index("parse_ok")
        ra = sorted(map(tuple, a.collect()), key=str)
        rb = sorted(map(tuple, b.collect()), key=str)
        assert len(ra) == len(rb) > 0
        assert ra == rb
        # the equality must cover BOTH branches: parsed records and the
        # null/parse-failure path
        assert any(r[ok_idx] for r in ra)
        assert any(not r[ok_idx] for r in ra)
    finally:
        frontier.unpersist()
