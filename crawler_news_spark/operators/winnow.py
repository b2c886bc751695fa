"""Winnowing document fingerprints (rolling hash) — Schleimer, Wilkerson,
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD'03).

k-gram rolling hashes over the normalized text; each sliding window of w
hashes contributes its minimum (rightmost on ties) — the classic guarantee
that any match of length >= w + k - 1 shares a fingerprint.  Arrow-batched
vUDF (no SQL twin — rolling state isn't ANSI-SQL-expressible; verified in
pytest against the pure-Python spec).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K = 5  # gram size
W = 4  # window size
_B = np.uint64(1000003)  # rolling base
_MOD_MASK = np.uint64((1 << 61) - 1)

_norm_re = re.compile(r"\s+")


def _normalize(text: str) -> str:
    return _norm_re.sub(" ", text.strip().lower())


def _gram_hashes(text: str) -> np.ndarray:
    """Polynomial rolling hashes of all k-grams (vectorized numpy)."""
    b = np.frombuffer(_normalize(text).encode("utf-8"), dtype=np.uint8)
    n = len(b) - K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    powers = np.array([int(_B) ** (K - 1 - i) % (1 << 61) for i in range(K)],
                      dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    for i in range(K):
        acc = (acc + b[i : i + n].astype(np.uint64) * powers[i]) & _MOD_MASK
    return acc


def winnow_py(text: str) -> list[int]:
    """Pure-Python/numpy spec: sorted distinct window-min fingerprints."""
    h = _gram_hashes(text)
    if len(h) == 0:
        return []
    if len(h) < W:
        return [int(h.min())]
    windows = np.lib.stride_tricks.sliding_window_view(h, W)
    # rightmost minimum per window (paper's robust winnowing tie rule)
    rev_arg = W - 1 - np.argmin(windows[:, ::-1], axis=1)
    mins = windows[np.arange(len(windows)), rev_arg]
    return sorted({int(x) for x in mins})


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", spread: bool = True) -> DataFrame:
    """(doc_id, fingerprints array<long>) via mapInPandas.

    ``spread`` repartitions the narrow projection first — a single parquet
    split would otherwise run the whole vUDF on 1-2 tasks (same trap as
    minhash_signatures)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprints": [
                        [x - (1 << 64) if x >= (1 << 63) else x for x in winnow_py(t)]
                        for t in pdf[text_col]
                    ],
                }
            )

    narrow = docs.select(id_col, text_col)
    if spread:
        narrow = narrow.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return narrow.mapInPandas(run, f"{id_col} long, fingerprints array<long>")


def winnow_overlap_pairs(docs: DataFrame, min_shared: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         max_df: int = 1000) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared fingerprints.

    explode -> document-frequency cap -> self-join on fingerprint (shuffle
    join on a high-cardinality key, not O(n^2)) -> group count filter.

    ``max_df`` drops fingerprints present in more than that many documents
    before the self-join: a boilerplate gram shared by k docs contributes
    k^2/2 join rows — one hot fingerprint across 10^6 docs is a 5*10^11-row
    key.  Capped fingerprints carry no near-dup signal anyway (they are
    corpus-wide boilerplate, not document identity)."""
    from . import _cache

    fp = winnow_fingerprints(docs, text_col, id_col)
    # persisted (named slot — re-invocation releases the old generation):
    # the exploded table feeds the df aggregate AND both join sides —
    # without it the fingerprint vUDF subtree re-executes 3x
    ex = _cache.claim(
        "winnow_overlap_pairs.ex", fp.select(id_col, F.explode("fingerprints").alias("fp"))
    )
    dfreq = ex.groupBy("fp").agg(F.count("*").alias("_df"))
    ex = (
        ex.join(dfreq.filter(F.col("_df") > max_df).select("fp"), "fp", "left_anti")
    )
    a = ex.select(F.col(id_col).alias("doc_a"), "fp")
    b = ex.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
