"""Parquet-backed crawl catalog with Iceberg-shaped semantics.

The north rule asks for Iceberg tables checkpointed every wave.  The sandbox
image has no Iceberg runtime jars (documented fallback per SURVEY.md §7), so
the catalog provides the same three properties on plain parquet:

- **append-only snapshots**: every table is laid out as
  ``{root}/{table}/wave={N}/part-*.parquet`` — a wave's commit is the atomic
  rename of its manifest entry, never an in-place rewrite;
- **exact resume**: ``manifest.json`` records the last *completed* wave; a
  restart replays from ``last_wave + 1`` reading only committed wave dirs
  (uncommitted partial dirs are ignored and overwritten);
- **partition pruning**: readers push ``wave=N`` down to directory pruning,
  and the seen/bloom tables are bucketed by ``pmod(canonical_hash, P)`` so a
  probe touches only its bucket.

On a real cluster the same call sites switch to
``df.writeTo(tbl).append()`` / ``spark.read.table`` — the wave loop is
storage-agnostic.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import weakref

from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency failure: the snapshot pointer moved between a
    writer's read and its commit (Iceberg ``CommitFailedException``).  The
    caller's retry loop re-reads the pointer and re-attempts."""


# One commit mutex per catalog root: the in-process stand-in for the
# metastore's atomic pointer swap — the CAS check + manifest replace must be
# one indivisible step or two racing threads could both pass the check.
# Cross-process atomicity is the production catalog's job (Iceberg does it
# in the metastore commit).  The registry is weak-valued so a long-lived
# process creating many temp-dir catalogs (the bench/test loop's
# corpus_cat_* roots) does not leak one lock per dead root: the entry lives
# exactly as long as some CrawlCatalog instance holds its mutex.
class _Mutex:
    """Weakref-able lock holder (a bare ``threading.Lock`` is a C object the
    weak registry cannot reference); usable as a context manager."""

    __slots__ = ("_lock", "__weakref__")

    def __init__(self) -> None:
        self._lock = threading.Lock()

    def __enter__(self):
        self._lock.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self._lock.release()


_COMMIT_MUTEXES: "weakref.WeakValueDictionary[str, _Mutex]" = (
    weakref.WeakValueDictionary()
)
_COMMIT_MUTEXES_GUARD = threading.Lock()


def _commit_mutex(root: str) -> _Mutex:
    key = os.path.realpath(root)
    with _COMMIT_MUTEXES_GUARD:
        m = _COMMIT_MUTEXES.get(key)
        if m is None:
            m = _Mutex()
            _COMMIT_MUTEXES[key] = m
        return m


class CrawlCatalog:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)
        self._commit_mutex = _commit_mutex(root)

    # ---- manifest --------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"last_wave": -1, "waves": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def commit_wave(self, wave: int, stats: dict,
                    expected_last: int | None = None) -> None:
        """Atomically mark ``wave`` complete (write-temp + rename).

        ``expected_last`` turns the commit into a compare-and-swap: if the
        pointer moved since the writer read it (another writer committed
        first), raise CommitConflictError instead of clobbering — Iceberg's
        optimistic-concurrency contract.  The caller re-reads the pointer,
        re-resolves its snapshot, and retries (see
        tests/test_catalog_contract.py::test_concurrent_commit_conflict).
        The default (None) is the single-writer wave loop's unconditional
        commit.  In-process, the CAS check + manifest swap run under a
        per-root mutex so concurrent writer threads serialize at the commit
        point and exactly one wins each slot
        (tests/test_catalog_contract.py::test_concurrent_writers_stress);
        cross-process CAS atomicity is the production catalog's job (Iceberg
        does it in the metastore swap).
        """
        with self._commit_mutex:
            m = self.read_manifest()
            if expected_last is not None and m["last_wave"] != expected_last:
                raise CommitConflictError(
                    f"snapshot pointer moved: expected last_wave={expected_last}, "
                    f"found {m['last_wave']}"
                )
            m["last_wave"] = wave
            m["waves"][str(wave)] = stats
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1)
            os.replace(tmp, self._manifest_path)

    def last_wave(self) -> int:
        return self.read_manifest()["last_wave"]

    # ---- table I/O ---------------------------------------------------------
    #
    # A wave slot can hold several snapshot dirs:
    #   wave-N        — written by the wave loop itself (plain)
    #   wave-N-injK   — pre-writes from inject_requests (tagged)
    # Tagged dirs let crash recovery tell injected pre-writes (which must
    # survive a crash of the not-yet-committed wave N) apart from the crashed
    # wave's own partial deltas (which must NOT — resuming with them present
    # would anti-join the re-run wave against its own discoveries and
    # silently drop every URL found in the crashed attempt).

    def _dir(self, table: str, wave: int | None = None, tag: str | None = None) -> str:
        # NOTE: "wave-N", not "wave=N" — the wave is carried as a data column
        # where needed, and key=value dirs would make Spark's partition
        # discovery collide with it.
        d = os.path.join(self.root, table)
        if wave is None:
            return d
        name = f"wave-{wave}" if tag is None else f"wave-{wave}-{tag}"
        return os.path.join(d, name)

    @staticmethod
    def _parse_wave_dir(name: str) -> tuple[int, str | None] | None:
        if not name.startswith("wave-"):
            return None
        parts = name.split("-", 2)
        try:
            w = int(parts[1])
        except ValueError:
            return None
        return w, (parts[2] if len(parts) > 2 else None)

    def _committed_dirs(self, table: str, upto: int) -> list[tuple[int, str | None, str]]:
        """All committed (wave, tag, path) snapshots of ``table`` with wave <= upto."""
        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for sub in sorted(os.listdir(tdir)):
            p = self._parse_wave_dir(sub)
            if p is None:
                continue
            w, tag = p
            full = os.path.join(tdir, sub)
            if w <= upto and os.path.exists(os.path.join(full, "_SUCCESS")):
                out.append((w, tag, full))
        return out

    def write(self, table: str, wave: int, df: DataFrame,
              parts: int | None = None, tag: str | None = None) -> None:
        """Append a wave snapshot.  ``parts`` coalesces small deltas so tiny
        waves don't write #shuffle-partitions near-empty files (at cluster
        scale leave None and let AQE size the output)."""
        if parts is not None:
            df = df.coalesce(parts)
        df.write.mode("overwrite").parquet(self._dir(table, wave, tag))

    def write_tagged(self, table: str, wave: int, df: DataFrame,
                     parts: int | None = None, prefix: str = "inj") -> str:
        """Append a tagged snapshot alongside the slot's other dirs (never
        overwrites — each call gets the next free injK tag)."""
        k = 0
        while os.path.exists(self._dir(table, wave, f"{prefix}{k}")):
            k += 1
        tag = f"{prefix}{k}"
        self.write(table, wave, df, parts, tag=tag)
        return tag

    def has(self, table: str, wave: int) -> bool:
        return any(w == wave for w, _t, _p in self._committed_dirs(table, wave))

    def read_wave(self, table: str, wave: int) -> DataFrame:
        """All committed snapshots of one slot (plain + tagged), unioned."""
        dirs = [p for w, _t, p in self._committed_dirs(table, wave) if w == wave]
        return self.spark.read.parquet(*dirs)

    def latest_wave_of(self, table: str, upto: int) -> int | None:
        """Highest committed wave <= upto that has a snapshot of ``table``
        (tables skip their write on empty waves)."""
        dirs = self._committed_dirs(table, upto)
        return max((w for w, _t, _p in dirs), default=None)

    def read_upto(self, table: str, upto_wave: int,
                  merge_schema: bool = False) -> DataFrame | None:
        """Union of all committed snapshots <= upto_wave (directory-pruned).

        ``merge_schema=True`` is the schema-evolution read: snapshots written
        before an add-column evolution are read with NULL for the new columns
        (Iceberg resolves this from table metadata; the parquet stand-in pays
        one footer-merge pass).  The wave loop's hot-path reads keep the
        default — their schemas are fixed per table.
        """
        dirs = [p for _w, _t, p in self._committed_dirs(table, upto_wave)]
        if not dirs:
            return None
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    # ---- maintenance (Iceberg expire_snapshots / rewrite_data_files) ------

    def compact(self, table: str, upto: int, parts: int | None = 1,
                merge_schema: bool = False) -> int:
        """Consolidate every committed snapshot <= ``upto`` into ONE snapshot
        at slot ``upto`` — rewrite_data_files followed by expire_snapshots.

        Post-conditions (the contract the jar swap preserves):
        - a current/time-travel read at >= upto returns identical rows;
        - time travel to waves < upto is expired (returns None);
        - the small-file count collapses to ``parts``.

        Crash safety: the consolidated snapshot is fully written (with
        _SUCCESS) into ``_compacting-{upto}`` BEFORE any source dir is
        removed — the dir NAME carries the horizon, so recovery promotes a
        crashed attempt into ITS OWN slot, never a later caller's (a stale
        snapshot covering waves <= 1 must not subsume waves appended after
        the crash).  A committed ``_compacting-{u}`` subsumes every
        committed dir <= u (the catalog is single-maintainer: nothing
        appends at <= u once the wave pointer has passed it).  Every call
        therefore finishes any prior attempt first: it removes that
        attempt's remaining subsumed sources and promotes its snapshot —
        covering a crash anywhere in the cleanup, including after the LAST
        source rmtree (where the fresh path would see zero committed dirs
        and silently strand the data).  A half-written attempt (no
        _SUCCESS) is discarded.  Real Iceberg makes the swap atomic in the
        metadata layer.
        """
        import shutil as _sh

        tdir = os.path.join(self.root, table)
        # Recover / discard prior attempts (dir name carries their horizon).
        recovered = 0
        if os.path.isdir(tdir):
            for d in sorted(os.listdir(tdir)):
                if not d.startswith("_compacting") or "orphaned" in d:
                    continue  # (quarantined dirs stay put for manual review)
                prior = os.path.join(tdir, d)
                suffix = d.removeprefix("_compacting").lstrip("-")
                committed = os.path.exists(os.path.join(prior, "_SUCCESS"))
                if not committed:
                    _sh.rmtree(prior)  # crashed mid-write: safe to discard
                    continue
                if not suffix.isdigit():
                    # legacy suffix-less attempt that DID commit: it may be
                    # the only copy of the table's data (pre-horizon code
                    # crashed after removing its last source dir), so never
                    # delete — quarantine for manual review.  The name is
                    # made UNIQUE (counter suffix) so a later legacy dir
                    # can never clobber an earlier quarantine: every
                    # quarantined copy survives, none is ever rmtree'd.
                    q, k = prior + "-orphaned", 0
                    while os.path.exists(q):
                        k += 1
                        q = f"{prior}-orphaned{k}"
                    os.rename(prior, q)
                    continue
                prior_upto = int(suffix)
                pdirs = self._committed_dirs(table, prior_upto)
                for _w, _t, p in pdirs:
                    _sh.rmtree(p)
                pdest = self._dir(table, prior_upto)
                if os.path.exists(pdest):  # uncommitted debris at the slot
                    _sh.rmtree(pdest)
                os.rename(prior, pdest)
                # accumulated, not assigned: the at-most-one-prior-attempt
                # invariant can be violated by manual intervention, and the
                # return value must still report every recovered dir
                recovered += max(len(pdirs), 1)

        dirs = self._committed_dirs(table, upto)
        if not dirs:
            return recovered
        tmp = os.path.join(tdir, f"_compacting-{upto}")
        dest = self._dir(table, upto)
        df = self.read_upto(table, upto, merge_schema=merge_schema)
        if parts is not None:
            df = df.coalesce(parts)
        df.write.mode("overwrite").parquet(tmp)
        for _w, _t, p in dirs:
            _sh.rmtree(p)
        if os.path.exists(dest):  # uncommitted debris at the slot
            _sh.rmtree(dest)
        os.rename(tmp, dest)
        return len(dirs)

    @staticmethod
    def _snapshot_order(d: tuple[int, str | None, str]):
        """Newest-snapshot ordering of a slot's dirs — the ONE definition
        shared by read_latest_state (which returns the max) and expire_state
        (which deletes everything else): within a slot the wave loop's plain
        write post-dates any injK tags (injection always precedes the wave
        run), and injK order is by K."""
        w, tag, _p = d
        if tag is None:
            return (w, 1, 0)
        return (w, 0, int(tag.removeprefix("inj") or 0) if tag.startswith("inj") else 0)

    def expire_state(self, table: str, upto: int) -> int:
        """Expire superseded generations of an overwrite/state table: keep
        only the NEWEST committed snapshot <= upto (the one
        read_latest_state returns); delete the rest.  Iceberg
        expire_snapshots on an overwrite table — old full generations are
        unreferenced by the current snapshot and reclaimable."""
        import shutil as _sh

        dirs = self._committed_dirs(table, upto)
        if len(dirs) <= 1:
            return 0

        keep = max(dirs, key=self._snapshot_order)[2]
        n = 0
        for _w, _t, p in dirs:
            if p != keep:
                _sh.rmtree(p)
                n += 1
        return n

    def read_latest_state(self, table: str, upto: int) -> DataFrame | None:
        """The single *newest* committed snapshot <= upto — for state tables
        (bloom/cuckoo) where each dir is a full merged filter, not a delta.

        Within a slot the wave loop's plain write post-dates any injK tags
        (injection always precedes the wave run), and injK order is by K.
        """
        dirs = self._committed_dirs(table, upto)
        if not dirs:
            return None
        return self.spark.read.parquet(max(dirs, key=self._snapshot_order)[2])

    def prune_uncommitted(self) -> None:
        """Drop wave dirs past the manifest's last completed wave (crash debris).

        Keep rules:
        - plain dirs: <= last, except ``frontier`` which keeps <= last+1
          (wave w's commit covers the next frontier it wrote at w+1);
        - tagged (injected) dirs: <= last+1 — inject_requests pre-writes
          frontier/seen/bloom deltas for the next wave, and those must
          survive a crash of that wave's first attempt.  The crashed wave's
          own deltas are plain dirs at last+1 and are dropped, restoring the
          exact-resume guarantee.
        """
        last = self.last_wave()
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for sub in os.listdir(tdir):
                p = self._parse_wave_dir(sub)
                if p is None:
                    continue
                w, tag = p
                if tag is None:
                    keep = w <= (last + 1 if table == "frontier" else last)
                else:
                    keep = w <= last + 1
                if not keep:
                    shutil.rmtree(os.path.join(tdir, sub))
