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

from pyspark.sql import DataFrame, SparkSession


class CrawlCatalog:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # ---- manifest --------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"last_wave": -1, "waves": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def commit_wave(self, wave: int, stats: dict) -> None:
        """Atomically mark ``wave`` complete (write-temp + rename)."""
        m = self.read_manifest()
        m["last_wave"] = wave
        m["waves"][str(wave)] = stats
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def last_wave(self) -> int:
        return self.read_manifest()["last_wave"]

    # ---- table I/O ---------------------------------------------------------

    def _dir(self, table: str, wave: int | None = None) -> str:
        # NOTE: "wave-N", not "wave=N" — the wave is carried as a data column
        # where needed, and key=value dirs would make Spark's partition
        # discovery collide with it.
        d = os.path.join(self.root, table)
        return d if wave is None else os.path.join(d, f"wave-{wave}")

    def write(self, table: str, wave: int, df: DataFrame, parts: int | None = None) -> None:
        """Append a wave snapshot.  ``parts`` coalesces small deltas so tiny
        waves don't write #shuffle-partitions near-empty files (at cluster
        scale leave None and let AQE size the output)."""
        if parts is not None:
            df = df.coalesce(parts)
        df.write.mode("overwrite").parquet(self._dir(table, wave))

    def has(self, table: str, wave: int) -> bool:
        return os.path.exists(os.path.join(self._dir(table, wave), "_SUCCESS"))

    def read_wave(self, table: str, wave: int) -> DataFrame:
        return self.spark.read.parquet(self._dir(table, wave))

    def latest_wave_of(self, table: str, upto: int) -> int | None:
        """Highest committed wave <= upto that has a snapshot of ``table``
        (tables skip their write on empty waves)."""
        for w in range(upto, -1, -1):
            if self.has(table, w):
                return w
        return None

    def read_upto(self, table: str, upto_wave: int) -> DataFrame | None:
        """Union of all committed waves <= upto_wave (directory-pruned)."""
        dirs = [
            self._dir(table, w)
            for w in range(upto_wave + 1)
            if self.has(table, w)
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def prune_uncommitted(self) -> None:
        """Drop wave dirs past the manifest's last completed wave (crash debris).

        Committing wave ``w`` covers tables written at ``wave=w`` plus the
        *next* frontier at ``wave=w+1``; injected requests (inject_requests)
        may also pre-write seen/bloom deltas at ``w+1`` — those three tables
        keep one extra wave.
        """
        last = self.last_wave()
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            keep = last + 1 if table in ("frontier", "seen", "bloom") else last
            for sub in os.listdir(tdir):
                if sub.startswith("wave-"):
                    w = int(sub.split("-")[1])
                    if w > keep:
                        shutil.rmtree(os.path.join(tdir, sub))
