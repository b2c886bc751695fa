"""Canonicalization: Spark expressions == Python mirror, plus properties."""

from pyspark.sql import functions as F

from crawler_news_spark.functions.urlnorm import (
    absolutize_col,
    absolutize_py,
    canonicalize_col,
    canonicalize_py,
)

CASES = [
    ("https://VNExpress.net/Thoi-su/bai-1234567.html?utm=x#frag", "https://vnexpress.net"),
    ("https://a.vn/x/y-1000001.html", "https://a.vn"),
    ("/relative/bai-2000002.html", "https://base.vn"),
    ("HTTP://UPPER.VN/path", "https://b.vn"),
    ("https://h.vn/p?a=1&b=2", "https://h.vn"),
    ("https://h.vn/p#only-frag", "https://h.vn"),
]


def test_canonicalize_parity(spark):
    df = spark.createDataFrame(CASES, "href string, base string")
    rows = df.select(
        "href",
        "base",
        canonicalize_col(absolutize_col(F.col("href"), F.col("base"))).alias("got"),
    ).collect()
    for r in rows:
        want = canonicalize_py(absolutize_py(r["href"], r["base"]))
        assert r["got"] == want, r["href"]


def test_canonical_strips_query_and_frag():
    assert canonicalize_py("https://h.vn/a?q=1#f") == "https://h.vn/a"


def test_canonical_lowercases_host_only():
    assert canonicalize_py("HTTPS://Host.VN/PaTh") == "https://host.vn/PaTh"


def test_xxhash_stable_across_plans(spark):
    """xxhash64 of the canonical URL is plan-independent (identity contract)."""
    df = spark.createDataFrame([("https://h.vn/a",)], "u string")
    a = df.select(F.xxhash64("u").alias("h")).collect()[0]["h"]
    b = (
        df.repartition(4)
        .select(F.xxhash64("u").alias("h"))
        .collect()[0]["h"]
    )
    assert a == b
