"""Salted joins and aggregations for skewed keys.

A shuffle join/groupBy hashes rows to tasks by key — one hot key (a giant
news host, a boilerplate fingerprint, a viral article's URL hash) lands on
ONE task and serializes the stage.  Salting splits the hot key into
``n_salts`` sub-keys:

- **salted_join(big, small, key)**: the big (skewed) side gets a
  deterministic salt ``pmod(xxhash64(all columns), n)``; the small side is
  replicated once per salt value (explode over 0..n-1) so every
  (key, salt) bucket finds its match.  Exact same result set as the plain
  join, but the hot key's rows spread over n tasks.
- **salted_count(df, keys)**: two-stage aggregation — count per
  (key, salt) first (map-side-combine-friendly, n partial rows per hot
  key), then sum per key.  Exact counts, no hot reducer.

AQE's skew-join handling covers sort-merge joins at runtime; salting is the
deterministic, plan-level tool for the cases AQE doesn't reach (broadcast-
ineligible small sides, aggregations, stateful pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join with the big side's hot keys spread over ``n_salts`` sub-keys.

    Deterministic: the salt is a hash of the big row's full content, so
    repeated runs produce identical partitioning (no rand() — rand breaks
    retry/replay determinism).  Result equals ``big.join(small, key, how)``
    for big-side-preserving joins only: each big row carries exactly one
    salt, so inner/left/left_semi/left_anti are exact, but right/full outer
    would replicate unmatched *small* rows once per salt (small is exploded
    n_salts times) — those are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins {sorted(allowed)}, "
            f"not {how!r}: the small side is replicated once per salt, so "
            "right/full outer would duplicate unmatched small rows"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Exact per-key counts via two-stage (key, salt) -> key aggregation."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt.cast("int"))
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_n"))
    )
    return partial.groupBy(*keys).agg(F.sum("_n").alias("n"))
