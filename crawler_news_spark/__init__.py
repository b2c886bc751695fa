"""crawler_news_spark — a PySpark-native crawl + analytics engine.

A from-scratch re-implementation of the query/data-processing capabilities of
the reference crawler ``lantuan2205/crawler_news`` (see /root/reference), built
Spark-first: DataFrame/SQL plans, vectorized Arrow UDFs for the fetch/parse
slow path, a partitioned bloom (cuckoo-fallback) URL-seen set, per-host
politeness with explicit skew handling, and a wave-checkpointed priority
frontier.

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster runs.
- ``schema``     Canonical StructTypes (frontier, documents/spans, articles, ...).
- ``sources``    Deterministic synthetic web (host simulator), seed readers.
- ``functions``  Scalar column functions (clean_date, URL canonicalization, text).
- ``operators``  fetch/parse vUDFs, seen-set, politeness, dedup, similarity.
- ``plans``      Wave loop, parquet-backed catalog (Iceberg-shaped), lineage.
- ``streaming``  Structured Streaming request intake -> frontier appends.
- ``oracle``     Pure-Python reference-semantics oracle (the correctness spec).
"""

__version__ = "0.1.0"
