#!/usr/bin/env python
"""Stage-by-stage profile of minhash_near_dups at a given SF dir (guide §1:
measure first, noop-sink isolation).  NOT part of the frozen bench."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"

from crawler_news_spark.session import get_spark
from crawler_news_spark.operators import dedup as DD
from crawler_news_spark.operators import _cache
from pyspark.sql import functions as F

spark = get_spark(app_name="profile_minhash")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
docs.count()  # warm

def timed(label, df, noop=True):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    if noop:
        df.write.format("noop").mode("overwrite").save()
        n = None
    else:
        n = df.count()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s rows={n}", flush=True)
    return dt

# stage 1: signatures
sigs = _cache.claim("prof.sigs", DD.minhash_signatures(docs))
timed("sigs (noop)", sigs)

# stage 2: banded LSH candidate pairs
pairs = DD.lsh_candidate_pairs(sigs)
t0 = time.time(); n_pairs = pairs.count(); print(f"pairs count: {time.time()-t0:.2f}s rows={n_pairs}", flush=True)

# stage 3: estimate prune
pruned = _cache.claim("prof.pruned", DD.sig_estimate_prune(pairs, sigs, "doc_id", 3))
t0 = time.time(); n_pruned = pruned.count(); print(f"pruned count: {time.time()-t0:.2f}s rows={n_pruned}", flush=True)

# stage 4: exact jaccard verify
jac = DD.exact_jaccard_on_pairs(pruned, docs)
timed("jaccard verify (noop)", jac)

out = jac.filter(F.col("jaccard_u") >= 400_000)
t0 = time.time(); n_out = out.count(); print(f"final count: {time.time()-t0:.2f}s rows={n_out}", flush=True)

# full pipeline end-to-end as the bench runs it
_cache.release_all()
t0 = time.time()
n = DD.minhash_near_dups(docs, threshold_u=400_000).count()
print(f"full pipeline: {time.time()-t0:.2f}s rows={n}", flush=True)
spark.stop()
