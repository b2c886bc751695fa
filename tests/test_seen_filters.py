"""Property tests for the bloom / cuckoo seen-set structures."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from crawler_news_spark.operators.seen import (
    BloomState,
    CuckooFilter,
    bloom_params,
    seen_anti_join,
)


@pytest.fixture(scope="module")
def hashes(spark):
    import random

    rng = random.Random(1234)
    vals = list({rng.getrandbits(63) - (1 << 62) for _ in range(5000)})
    seen_vals = vals[:3000]
    probe_vals = vals[2000:]  # 1000 overlap, 2000 new
    seen = spark.createDataFrame([(v,) for v in seen_vals], "canonical_hash long")
    probe = spark.createDataFrame([(v,) for v in probe_vals], "canonical_hash long")
    return seen_vals, probe_vals, seen, probe


def test_bloom_no_false_negatives(spark, hashes):
    seen_vals, probe_vals, seen, probe = hashes
    m, k = bloom_params(2000, fpr=0.01)
    st = BloomState(n_buckets=4, m_bits=m, k=k)
    bloom = st.merge(st.empty_df(spark), st.build_delta(seen))
    probed = st.probe(probe, bloom).collect()
    seen_set = set(seen_vals)
    fp = 0
    for r in probed:
        if r["canonical_hash"] in seen_set:
            assert r["maybe_seen"], "bloom false negative!"
        elif r["maybe_seen"]:
            fp += 1
    # FPR sanity (sized for 1%; allow generous slack)
    assert fp / 2000 < 0.05


def test_exact_anti_join_with_bloom(spark, hashes):
    seen_vals, probe_vals, seen, probe = hashes
    m, k = bloom_params(2000, fpr=0.01)
    st = BloomState(n_buckets=4, m_bits=m, k=k)
    bloom = st.merge(st.empty_df(spark), st.build_delta(seen))
    new_rows, recovered = seen_anti_join(probe, seen, st, bloom)
    got = {r["canonical_hash"] for r in new_rows.collect()}
    want = set(probe_vals) - set(seen_vals)
    assert got == want  # exactness: no loss to FPs, no leakage of seen


def test_bloom_incremental_merge(spark):
    st = BloomState(n_buckets=2, m_bits=4096, k=5)
    d1 = spark.createDataFrame([(i,) for i in range(100)], "canonical_hash long")
    d2 = spark.createDataFrame([(i,) for i in range(100, 200)], "canonical_hash long")
    b = st.merge(st.empty_df(spark), st.build_delta(d1))
    b = st.merge(b, st.build_delta(d2))
    all_ = spark.createDataFrame([(i,) for i in range(200)], "canonical_hash long")
    probed = st.probe(all_, b).collect()
    assert all(r["maybe_seen"] for r in probed)


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(capacity=4096)
    rng = np.random.default_rng(7)
    keys = [int(x) for x in rng.integers(0, 2**63, 2000)]
    for kx in keys:
        assert cf.insert(kx)
    assert all(cf.contains(kx) for kx in keys)
    # delete half; deleted keys should (mostly) vanish, kept keys must remain
    for kx in keys[:1000]:
        assert cf.delete(kx)
    assert all(cf.contains(kx) for kx in keys[1000:])  # no false negatives
    resurrect = sum(cf.contains(kx) for kx in keys[:1000])
    assert resurrect / 1000 < 0.05  # only fingerprint collisions remain


def test_cuckoo_roundtrip_bytes():
    cf = CuckooFilter(capacity=256)
    for kx in range(100):
        cf.insert(kx * 2654435761)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), capacity=256)
    assert all(cf2.contains(kx * 2654435761) for kx in range(100))


def test_cuckoo_state_n_items_accumulates(spark):
    """(bucket, n_items) metadata: seeds from the prior table row, counts
    only successful inserts/deletes (a non-member delete is a no-op)."""
    from crawler_news_spark.operators.seen import CuckooState

    st = CuckooState(n_buckets=2, capacity_per_bucket=1024)
    h1 = spark.createDataFrame([(i,) for i in range(10)], "canonical_hash long")
    h2 = spark.createDataFrame([(i,) for i in range(10, 16)], "canonical_hash long")
    t1 = st.update(None, h1, spark).localCheckpoint()
    assert sum(r["n_items"] for r in t1.collect()) == 10
    t2 = st.update(t1, h2).localCheckpoint()
    assert sum(r["n_items"] for r in t2.collect()) == 16  # accumulated, not 6
    # deleting members decrements; deleting non-members is a counted no-op
    dele = spark.createDataFrame([(0,), (1,), (999_999,)], "canonical_hash long")
    t3 = st.delete(t2, dele).localCheckpoint()
    total = sum(r["n_items"] for r in t3.collect())
    assert total == 14 or total == 15  # 999999 may fp-collide; never < 14
    assert all(r["n_items"] >= 0 for r in t3.collect())
