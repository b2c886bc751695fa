"""Salted join/aggregation: exact results with hot keys spread over salts."""

import pytest

from pyspark.sql import functions as F

from crawler_news_spark.operators.skewjoin import salted_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one key carries 90% of the rows
    rows = [(("hot" if i % 10 != 9 else f"k{i % 97}"), i) for i in range(20_000)]
    big = spark.createDataFrame(rows, "key string, val long")
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i + 2) for i in range(97)], "key string, attr int"
    )
    return big, dim


def test_salted_join_equals_plain_join(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "key")
    salted = salted_join(big, dim, "key", n_salts=8)
    assert salted.count() == plain.count()
    a = {(r["key"], r["val"], r["attr"]) for r in plain.collect()}
    b = {(r["key"], r["val"], r["attr"]) for r in salted.collect()}
    assert a == b


def test_salted_join_spreads_hot_key(spark, skewed):
    big, dim = skewed
    # the hot key's rows land in >1 (key, salt) shuffle bucket
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    n_buckets = (
        big.filter(F.col("key") == "hot")
        .select(salt.alias("s")).distinct().count()
    )
    assert n_buckets == 8  # 18k rows hash into all 8 salts w.h.p.


def test_salted_join_outer_keys_survive(spark, skewed):
    big, dim = skewed
    # a big-side key missing from dim survives a left join exactly once per row
    extra = big.unionByName(
        spark.createDataFrame([("orphan", 1_000_000)], "key string, val long")
    )
    out = salted_join(extra, dim, "key", n_salts=8, how="left")
    orphan = [r for r in out.collect() if r["key"] == "orphan"]
    assert len(orphan) == 1 and orphan[0]["attr"] is None


def test_salted_count_exact(spark, skewed):
    big, _ = skewed
    want = {r["key"]: r["n"] for r in
            big.groupBy("key").agg(F.count("*").alias("n")).collect()}
    got = {r["key"]: r["n"] for r in salted_count(big, ["key"], n_salts=8).collect()}
    assert got == want
