"""URL-seen set: partitioned bloom prefilter + exact anti-join (+ cuckoo).

Design (north_rule: "partitioned bloom-filter (with cuckoo fallback for
deletions) URL-seen set built in vectorized Arrow UDFs over canonicalized-URL
hashes"):

- Identity is ``xxhash64(canonical_url)`` computed JVM-side
  (functions/urlnorm.py).  The bloom operates on those 64-bit hashes only —
  no strings cross into Python.
- The filter is **partitioned by ``pmod(hash, P)``**: one bitset per bucket,
  stored as a ``(bucket, bits, n_items)`` parquet table.  At 10^10 URLs a
  monolithic bloom (~12 GB at 10 bits/key) cannot be broadcast; bucketing
  makes the probe a co-partitioned join — each task reads only its bucket's
  bits.  At test scale the same plan runs with a handful of buckets.
- Bloom answers are **advisory only**: a candidate flagged "maybe seen" goes
  through the exact anti-join against the ``seen`` table; "definitely new"
  (bloom has no false negatives) skips the join entirely.  False positives
  therefore cost a join probe, never a lost URL — the final seen set is exact
  (the north rule's equality requirement).
- Deletions (re-crawl eviction) can't be expressed in a bloom; the
  :class:`CuckooFilter` provides delete support behind the same bucket-table
  contract (used when ``evict=True`` paths are needed).

Both build and probe are ``applyInPandas`` over bucket groups — vectorized
numpy inside, shuffle keyed by bucket outside (explicit partitioning, no
skew: buckets are uniform by construction since the key is a hash).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, bits binary, n_items long"

_MASK64 = (1 << 64) - 1


def _positions(h: np.ndarray, k: int, m_bits: int) -> Iterator[np.ndarray]:
    """k double-hashed bit positions per element (h: uint64 array)."""
    h1 = h % np.uint64(m_bits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> np.uint64(3), (1 << (pos & np.uint64(7))).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (bits[pos >> np.uint64(3)] & (1 << (pos & np.uint64(7))).astype(np.uint8)) != 0


def bloom_params(expected_per_bucket: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for the expected per-bucket load."""
    n = max(expected_per_bucket, 64)
    m = int(-n * math.log(fpr) / (math.log(2) ** 2))
    m = max(512, (m + 7) // 8 * 8)
    k = max(1, round(m / n * math.log(2)))
    return m, k


class BloomState:
    """Driver-side handle for the partitioned bloom table."""

    def __init__(self, n_buckets: int, m_bits: int, k: int):
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k

    def empty_df(self, spark: SparkSession) -> DataFrame:
        pdf = pd.DataFrame(
            {
                "bucket": pd.array(range(self.n_buckets), dtype="int32"),
                "bits": [bytes(self.m_bits // 8)] * self.n_buckets,
                "n_items": pd.array([0] * self.n_buckets, dtype="int64"),
            }
        )
        return spark.createDataFrame(pdf, BLOOM_SCHEMA)

    def bucket_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")

    # ---- build / merge -----------------------------------------------------

    def build_delta(self, new_hashes: DataFrame, hash_col: str = "canonical_hash") -> DataFrame:
        """Per-bucket bitsets for a batch of new hashes (applyInPandas)."""
        m_bits, k = self.m_bits, self.k

        def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            h = pdf[hash_col].to_numpy().astype(np.int64).view(np.uint64)
            for pos in _positions(h, k, m_bits):
                _set_bits(bits, pos)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()],
                 "n_items": [len(pdf)]}
            )

        keyed = new_hashes.withColumn("bucket", self.bucket_col(F.col(hash_col)))
        return keyed.groupBy("bucket").applyInPandas(per_bucket, BLOOM_SCHEMA)

    def merge(self, old: DataFrame, delta: DataFrame) -> DataFrame:
        """OR the delta bitsets into the old table (outer union by bucket)."""

        def orbits(pdf: pd.DataFrame) -> pd.DataFrame:
            acc: np.ndarray | None = None
            n = 0
            for b, items in zip(pdf["bits"], pdf["n_items"]):
                arr = np.frombuffer(b, dtype=np.uint8)
                acc = arr.copy() if acc is None else acc | arr
                n += int(items)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()],
                 "n_items": [n]}
            )

        return old.unionByName(delta).groupBy("bucket").applyInPandas(orbits, BLOOM_SCHEMA)

    def update(self, table: DataFrame | None, new_hashes: DataFrame,
               spark: SparkSession | None = None) -> DataFrame:
        """Uniform update interface shared with :class:`CuckooState`."""
        if table is None:
            table = self.empty_df(spark or new_hashes.sparkSession)
        return self.merge(table, self.build_delta(new_hashes))

    # ---- probe ---------------------------------------------------------------

    def probe(self, candidates: DataFrame, bloom: DataFrame,
              hash_col: str = "canonical_hash") -> DataFrame:
        """Adds ``maybe_seen`` to candidates.

        The bitset is delivered ONCE per bucket group by unioning the bloom
        rows (hash=null, bits set) with the skinny candidate hashes
        (bits=null) and grouping by bucket — never joined onto candidate rows
        (a per-row ~0.3 MB binary would multiply shuffle volume by ~5 orders
        of magnitude; measured 229 s vs ~2 s at a 150k-candidate wave).
        Flags are joined back on the hash — two skinny shuffles total.
        """
        m_bits, k = self.m_bits, self.k
        keyed = candidates.withColumn("bucket", self.bucket_col(F.col(hash_col)))
        # NB: the hash column must stay non-null int64 end-to-end — a nullable
        # union would surface in pandas as float64 and corrupt 64-bit hashes
        # (53-bit mantissa); bloom rows are marked with is_b instead.
        probe_in = keyed.select(
            "bucket",
            F.col(hash_col).alias("_h"),
            F.lit(False).alias("is_b"),
            F.lit(None).cast("binary").alias("bits"),
        ).unionByName(
            bloom.select(
                "bucket",
                F.lit(0).cast("long").alias("_h"),
                F.lit(True).alias("is_b"),
                "bits",
            )
        )

        def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            is_bits = pdf["is_b"].to_numpy()
            bits_rows = pdf.loc[is_bits, "bits"]
            hashes = pdf.loc[~is_bits, "_h"]
            h = hashes.to_numpy().astype(np.int64).view(np.uint64)
            if len(bits_rows) == 0:
                maybe = np.zeros(len(h), dtype=bool)
            else:
                bits = np.frombuffer(bits_rows.iloc[0], dtype=np.uint8)
                maybe = np.ones(len(h), dtype=bool)
                for pos in _positions(h, k, m_bits):
                    maybe &= _test_bits(bits, pos)
            return pd.DataFrame({"_h": hashes.astype("int64"), "maybe_seen": maybe})

        flags = probe_in.groupBy("bucket").applyInPandas(
            per_bucket, "_h long, maybe_seen boolean"
        )
        return keyed.join(flags, keyed[hash_col] == flags["_h"], "left").drop("_h")


def seen_anti_join(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom_state: BloomState | None = None,
    bloom: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Exact not-in-seen filter with optional bloom prefilter.

    Returns (new_rows, maybe_rows_that_were_fp or None).  ``new_rows`` is
    exact: bloom false positives are recovered by the anti-join; bloom false
    negatives are impossible.
    """
    if seen is None:
        return candidates, None
    if bloom_state is None or bloom is None:
        return (
            candidates.join(
                seen.select("canonical_hash").distinct(), "canonical_hash", "left_anti"
            ),
            None,
        )
    probed = bloom_state.probe(candidates, bloom)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen", "bucket")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen", "bucket")
    recovered = maybe.join(
        seen.select("canonical_hash").distinct(), "canonical_hash", "left_anti"
    )
    return definite_new.unionByName(recovered), recovered


class CuckooState:
    """Distributed, bucketed cuckoo-filter table — same contract as
    :class:`BloomState` (update/probe over a ``(bucket, bits, n_items)``
    table) plus :meth:`delete` for re-crawl eviction, which a bloom cannot do.

    Same union-trick plumbing as the bloom probe: bits travel once per bucket
    group, hashes stay skinny and non-null.
    """

    def __init__(self, n_buckets: int, capacity_per_bucket: int):
        self.n_buckets = n_buckets
        self.capacity = capacity_per_bucket

    def bucket_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")

    def empty_df(self, spark: SparkSession) -> DataFrame:
        empty = CuckooFilter(self.capacity).to_bytes()
        pdf = pd.DataFrame(
            {
                "bucket": pd.array(range(self.n_buckets), dtype="int32"),
                "bits": [empty] * self.n_buckets,
                "n_items": pd.array([0] * self.n_buckets, dtype="int64"),
            }
        )
        return spark.createDataFrame(pdf, BLOOM_SCHEMA)

    def _apply(self, table: DataFrame, hashes: DataFrame, op: str,
               hash_col: str = "canonical_hash") -> DataFrame:
        cap = self.capacity

        keyed = hashes.select(
            self.bucket_col(F.col(hash_col)).alias("bucket"),
            F.col(hash_col).alias("_h"),
            F.lit(False).alias("is_b"),
            F.lit(None).cast("binary").alias("bits"),
            F.lit(0).cast("long").alias("n0"),
        ).unionByName(
            table.select(
                "bucket", F.lit(0).cast("long").alias("_h"),
                F.lit(True).alias("is_b"), "bits",
                F.col("n_items").alias("n0"),
            )
        )

        def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            is_bits = pdf["is_b"].to_numpy()
            bits_rows = pdf.loc[is_bits, "bits"]
            hs = pdf.loc[~is_bits, "_h"].to_numpy().astype(np.int64)
            if len(bits_rows):
                cf = CuckooFilter.from_bytes(bits_rows.iloc[0], cap)
                # seed from the incoming state — n_items accumulates across
                # updates, not per batch
                n = int(pdf.loc[is_bits, "n0"].iloc[0])
            else:
                cf = CuckooFilter(cap)
                n = 0
            for h in hs:
                hu = int(h) & _MASK64
                if op == "insert":
                    cf.insert(hu)  # grows the table chain on overflow
                    n += 1
                elif cf.delete(hu):  # only count deletes that removed something
                    n -= 1
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [cf.to_bytes()],
                 "n_items": [n]}
            )

        return keyed.groupBy("bucket").applyInPandas(per_bucket, BLOOM_SCHEMA)

    def update(self, table: DataFrame | None, new_hashes: DataFrame,
               spark: SparkSession | None = None) -> DataFrame:
        if table is None:
            table = self.empty_df(spark or new_hashes.sparkSession)
        return self._apply(table, new_hashes, "insert")

    def delete(self, table: DataFrame, hashes: DataFrame) -> DataFrame:
        return self._apply(table, hashes, "delete")

    def probe(self, candidates: DataFrame, table: DataFrame,
              hash_col: str = "canonical_hash") -> DataFrame:
        cap = self.capacity
        keyed = candidates.withColumn("bucket", self.bucket_col(F.col(hash_col)))
        probe_in = keyed.select(
            "bucket", F.col(hash_col).alias("_h"),
            F.lit(False).alias("is_b"), F.lit(None).cast("binary").alias("bits"),
        ).unionByName(
            table.select(
                "bucket", F.lit(0).cast("long").alias("_h"),
                F.lit(True).alias("is_b"), "bits",
            )
        )

        def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            is_bits = pdf["is_b"].to_numpy()
            bits_rows = pdf.loc[is_bits, "bits"]
            hashes = pdf.loc[~is_bits, "_h"]
            if len(bits_rows) == 0:
                maybe = np.zeros(len(hashes), dtype=bool)
            else:
                cf = CuckooFilter.from_bytes(bits_rows.iloc[0], cap)
                maybe = np.fromiter(
                    (cf.contains(int(h) & _MASK64) for h in hashes),
                    dtype=bool, count=len(hashes),
                )
            return pd.DataFrame({"_h": hashes.astype("int64"), "maybe_seen": maybe})

        flags = probe_in.groupBy("bucket").applyInPandas(
            per_bucket, "_h long, maybe_seen boolean"
        )
        return keyed.join(flags, keyed[hash_col] == flags["_h"], "left").drop("_h")


# ---------------------------------------------------------------------------
# Cuckoo filter (deletion-capable fallback, north_rule)
# ---------------------------------------------------------------------------


class _CuckooTable:
    """One fixed-size cuckoo table: 16-bit fingerprints, 4 slots per bucket."""

    SLOTS = 4

    def __init__(self, capacity: int, table: np.ndarray | None = None):
        n_buckets = max(1, 1 << math.ceil(math.log2(max(capacity, 4) / self.SLOTS)))
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )

    @staticmethod
    def _fp(h: int) -> int:
        fp = (h >> 40) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, h: int) -> int:
        return h % self.n_buckets

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ (fp * 0x5BD1E995)) % self.n_buckets

    def insert(self, h: int, max_kicks: int = 500) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        i = i1 if h % 2 else i2
        rng = np.random.default_rng(h & _MASK64)
        trail: list[tuple[int, int, int]] = []  # (bucket, slot, displaced fp)
        for _ in range(max_kicks):
            slot = int(rng.integers(self.SLOTS))
            trail.append((i, slot, int(self.table[i, slot])))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # table full: the kick walk displaced resident fingerprints and the
        # last victim is in hand — undo the walk so failure leaves the table
        # EXACTLY as it was (the caller retries in a grown table; a mutated
        # table here silently evicts a resident key -> false negative)
        for b, s, old in reversed(trail):
            self.table[b, s] = old
        return False

    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, h: int) -> bool:
        fp = self._fp(h)
        for i in (self._i1(h), self._i2(self._i1(h), fp)):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                self.table[i, idx[0]] = 0
                return True
        return False


class CuckooFilter:
    """A dynamic (growable) cuckoo filter over 64-bit hashes.

    Used for re-crawl eviction where the bloom can't delete.  Bucketized the
    same way as the bloom at scale (one filter per hash bucket); exposed here
    as the per-bucket primitive with insert/delete/contains + serialization.

    Overflow handling (r03): a cuckoo table cannot be rehashed in place —
    resident entries are 16-bit fingerprints, not keys, so their home bucket
    in a larger table is unrecoverable.  Instead this is a *dynamic cuckoo
    filter* (Chen et al., ICNP'17 shape): a chain of fixed tables; when the
    newest fills past its kick budget, a table of 2x its buckets is appended
    and inserts continue there.  ``contains``/``delete`` scan the chain (FP
    rate grows ~linearly with chain length, which doubling keeps O(log n)).
    A load factor of ~0.95 per table holds before a grow, so a
    capacity_per_bucket underestimate degrades smoothly instead of killing
    the job mid-wave (previously: RuntimeError at 10^10-insert scale).

    Serialization: uint64 n_tables, then per table uint64 n_buckets + the
    uint16 slot matrix.
    """

    SLOTS = _CuckooTable.SLOTS

    def __init__(self, capacity: int, tables: list[_CuckooTable] | None = None):
        self.capacity = capacity
        self.tables = tables if tables is not None else [_CuckooTable(capacity)]

    def insert(self, h: int, max_kicks: int = 500) -> bool:
        """Insert into the newest table, growing the chain on overflow.
        Always returns True (kept boolean for the paper's API shape)."""
        if self.tables[-1].insert(h, max_kicks):
            return True
        grown = _CuckooTable(self.tables[-1].n_buckets * 2 * self.SLOTS)
        self.tables.append(grown)
        return grown.insert(h, max_kicks)

    def contains(self, h: int) -> bool:
        return any(t.contains(h) for t in self.tables)

    def delete(self, h: int) -> bool:
        # newest-first: a duplicate insert lands in the newest table; delete
        # mirrors insert order so paired insert/delete cancels exactly
        for t in reversed(self.tables):
            if t.delete(h):
                return True
        return False

    def to_bytes(self) -> bytes:
        parts = [np.array([len(self.tables)], dtype=np.uint64).tobytes()]
        for t in self.tables:
            parts.append(np.array([t.n_buckets], dtype=np.uint64).tobytes())
            parts.append(t.table.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int) -> "CuckooFilter":
        buf = memoryview(data)
        n_tables = int(np.frombuffer(buf[:8], dtype=np.uint64)[0])
        off = 8
        tables = []
        for _ in range(n_tables):
            nb = int(np.frombuffer(buf[off : off + 8], dtype=np.uint64)[0])
            off += 8
            size = nb * cls.SLOTS * 2
            arr = (
                np.frombuffer(buf[off : off + size], dtype=np.uint16)
                .reshape(nb, cls.SLOTS)
                .copy()
            )
            off += size
            t = _CuckooTable(nb * cls.SLOTS, arr)
            t.n_buckets = nb
            tables.append(t)
        return cls(capacity, tables)
