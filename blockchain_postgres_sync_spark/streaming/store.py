"""Versioned parquet table store with atomic batch promotion.

The reference applies each micro-batch inside ONE Postgres transaction
(src/lib/consumer/mod.rs:168-186) — all 25+ tables move together or not at
all.  The append-only analog (T1, SURVEY.md §2.9): every table write lands
in a new versioned directory, and a batch "commits" by atomically replacing
a single manifest file that maps table -> current version.  Readers resolve
through the manifest, so a crashed batch leaves only unreferenced garbage,
never a torn state.  (Same idea as Delta/Iceberg's manifest pointer, reduced
to the minimum this engine needs.)
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: directory name Spark/Hive uses for NULL partition values
_HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "MANIFEST.json")
        self._manifest: dict[str, int] = {}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)
        self._staged: dict[str, int] = {}

    # -- read side -----------------------------------------------------

    def exists(self, name: str) -> bool:
        return name in {**self._manifest, **self._staged}

    def read(self, name: str) -> DataFrame:
        versions = {**self._manifest, **self._staged}
        if name not in versions:
            raise KeyError(f"table {name} not in store")
        return self.spark.read.parquet(self._dir(name, versions[name]))

    def read_or_none(self, name: str) -> DataFrame | None:
        return self.read(name) if self.exists(name) else None

    # -- write side ----------------------------------------------------

    def stage(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Write ``df`` as the next version of ``name`` (visible to this
        store instance immediately, to other readers only after commit)."""
        next_v = max(self._manifest.get(name, -1), self._staged.get(name, -1)) + 1
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._dir(name, next_v))
        self._ensure_readable(name, next_v, df)
        self._staged[name] = next_v

    def _ensure_readable(self, name: str, version: int, df: DataFrame) -> None:
        """A partitioned write of an EMPTY frame emits no parquet files (and
        thus no schema); rewrite it flat so readers always infer a schema
        (the partition column stays as a data column — filters still work)."""
        d = self._dir(name, version)
        for _root, _dirs, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return
        df.limit(0).write.mode("overwrite").parquet(d)

    def stage_range_replace(
        self,
        name: str,
        new_df: DataFrame,
        partition_col: str,
        replace_from,
    ) -> None:
        """Stage a new version where every partition with value >=
        ``replace_from`` (string order) comes from ``new_df`` and every
        partition below it is HARDLINKED from the previous version (no data
        copy, no read).  ``replace_from`` may also be a callable
        ``(partition_value: str) -> bool`` returning True for REPLACED
        partitions — used when the replaced set isn't a single ordered
        range (e.g. the unified candles table, where each interval has its
        own month boundary).  This is the 100 TB form of the per-batch
        candle upsert/rollback: a reorg or candle recompute touches a
        bounded, right-open time range, so the rewrite cost is O(affected
        partitions), not O(table) — and stale partitions above the boundary
        that ``new_df`` no longer produces disappear, which is exactly the
        rollback delete (S7).  ``new_df`` must contain exactly the rows of
        the replaced partitions.

        Falls back to a plain partitioned stage when the table doesn't
        exist yet.
        """
        prev_v = self._staged.get(name, self._manifest.get(name))
        if prev_v is None:
            self.stage(name, new_df, partition_by=[partition_col])
            return
        next_v = max(self._manifest.get(name, -1), self._staged.get(name, -1)) + 1
        new_dir = self._dir(name, next_v)
        new_df.write.mode("overwrite").partitionBy(partition_col).parquet(new_dir)
        # link kept (strictly-below-boundary) partition dirs from prev version
        prev_dir = self._dir(name, prev_v)
        prefix = f"{partition_col}="

        def _ge(a: str, b: str | int) -> bool:
            try:
                return int(a) >= int(b)
            except ValueError:
                return str(a) >= str(b)

        if callable(replace_from):
            replaced = replace_from
        else:
            replaced = lambda v: _ge(v, replace_from)

        from urllib.parse import unquote

        linked = False
        for entry in os.listdir(prev_dir):
            src = os.path.join(prev_dir, entry)
            if not entry.startswith(prefix) or not os.path.isdir(src):
                continue
            if replaced(unquote(entry[len(prefix):])):
                continue  # replaced (or deleted) range
            dst = os.path.join(new_dir, entry)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.endswith(".parquet"):
                    os.link(os.path.join(src, fn), os.path.join(dst, fn))
                    linked = True
        if not linked:
            self._ensure_readable(name, next_v, new_df)
        self._staged[name] = next_v

    def compact(
        self,
        name: str,
        partition_col: str | None = None,
        max_files: int = 4,
        target_files: int = 1,
    ) -> bool:
        """Small-file compaction — the OPTIMIZE of a long-running store.
        A partition written by a parallel stage carries one file per write
        task, and ``stage_range_replace`` hardlinks untouched partitions
        forward with their historical file counts intact — so over a long
        run hot partitions fragment and per-file task setup starts to
        dominate scans.  Rewrites each partition whose parquet-file count exceeds
        ``max_files`` down to one file (each partition value hashes to
        exactly one task of the repartition, so one file per directory);
        already-compact partitions HARDLINK forward unchanged.  Content is
        row-identical, the new version goes live atomically at
        :meth:`commit` like any staged write.  Returns False when nothing
        needed compaction (no new version staged).

        Unpartitioned tables (small dimensions) rewrite to
        ``target_files`` files when over ``max_files``.  At 100 TB run
        this per hot partition on a schedule, exactly like any lakehouse
        OPTIMIZE job; cost is O(fat partitions), never O(table).
        """
        prev_v = self._staged.get(name, self._manifest.get(name))
        if prev_v is None:
            raise KeyError(f"table {name} not in store")
        prev_dir = self._dir(name, prev_v)

        def n_parquet(d: str) -> int:
            return sum(
                1 for fn in os.listdir(d) if fn.endswith(".parquet")
            ) if os.path.isdir(d) else 0

        if partition_col is None:
            if n_parquet(prev_dir) <= max_files:
                return False
            self.stage(name, self.read(name).coalesce(target_files))
            return True

        prefix = f"{partition_col}="
        from urllib.parse import unquote

        fat = {
            unquote(e[len(prefix):])
            for e in os.listdir(prev_dir)
            if e.startswith(prefix)
            and n_parquet(os.path.join(prev_dir, e)) > max_files
        }
        if not fat:
            return False
        df = self.read(name)
        # NULL partition values live in the Hive default-partition dir; an
        # isin() filter never matches NULL rows, so without an explicit
        # isNull() branch a fat NULL partition would be dropped from the
        # rewrite while the replace predicate still retires its old dir —
        # silent data loss.  (A literal string equal to the sentinel shares
        # the dir — Hive's own ambiguity — so the isin branch keeps it too.)
        cond = F.col(partition_col).cast("string").isin(*fat)
        if _HIVE_NULL_PART in fat:
            cond = cond | F.col(partition_col).isNull()
        fat_rows = df.filter(cond).repartition(max(len(fat), 1), partition_col)
        self.stage_range_replace(
            name, fat_rows, partition_col, lambda v: v in fat
        )
        return True

    def commit(self) -> None:
        """Atomically promote all staged tables (the per-batch transaction).
        os.replace is atomic on POSIX; on an object store this would be a
        conditional-put of the manifest object."""
        if not self._staged:
            return
        merged = {**self._manifest, **self._staged}
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self._manifest_path)
        old = self._manifest
        self._manifest = merged
        self._staged = {}
        # garbage-collect superseded versions
        for name, v in merged.items():
            prev = old.get(name)
            if prev is not None and prev != v:
                shutil.rmtree(self._dir(name, prev), ignore_errors=True)

    def rollback_staged(self) -> None:
        for name, v in self._staged.items():
            shutil.rmtree(self._dir(name, v), ignore_errors=True)
        self._staged = {}

    def _dir(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v{version:06d}")
