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

    def stage(self, name: str, df: DataFrame) -> None:
        """Write ``df`` as the next version of ``name`` (visible to this
        store instance immediately, to other readers only after commit)."""
        next_v = max(self._manifest.get(name, -1), self._staged.get(name, -1)) + 1
        df.write.mode("overwrite").parquet(self._dir(name, next_v))
        self._staged[name] = next_v

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
