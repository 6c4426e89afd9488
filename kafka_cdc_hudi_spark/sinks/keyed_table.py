"""Keyed, upsert-able parquet table — the pure-Spark stand-in for the
reference's Hudi COPY_ON_WRITE sink (/root/reference/glue/cdc_hudi.py:179-216).

Layout::

    <root>/
      v_00000001/ ... v_0000000N/   immutable parquet snapshots
      _VERSION                      text file: latest committed version + batch id

Commit protocol: write the new snapshot directory fully, then atomically
rewrite the ``_VERSION`` pointer (rename). Readers resolve the pointer first,
so a crashed write leaves only an orphan directory, never a torn table —
this is a miniature of Hudi's timeline/commit files. Old versions are pruned
keeping ``keep_versions`` (reference cleaner retained=2..4 commits,
/root/reference/glue/cdc_hudi.py:198-200).

Exactly-once on top of at-least-once ``foreachBatch``: the pointer records
the last merged streaming batch id; replaying an already-committed batch is
a no-op (SURVEY §7 hard-part 5). The merge itself is also idempotent, so
this is belt and braces.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from kafka_cdc_hudi_spark.operators.merge import merge_upsert


class KeyedParquetTable:
    def __init__(
        self,
        root: str,
        keys: Sequence[str],
        order_col: str = "mtime",
        deleted_col: str = "_deleted",
        tiebreakers: Sequence[str] = (),
        keep_versions: int = 3,
    ):
        self.root = root
        self.keys = list(keys)
        self.order_col = order_col
        self.deleted_col = deleted_col
        self.tiebreakers = list(tiebreakers)
        self.keep_versions = keep_versions

    # -- pointer management -------------------------------------------------
    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_VERSION")

    def _read_pointer(self) -> dict | None:
        try:
            with open(self._pointer_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _write_pointer(self, version: int, batch_id: int | None) -> None:
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "last_batch_id": batch_id}, f)
        os.replace(tmp, self._pointer_path)  # atomic on POSIX

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version:08d}")

    # -- public API ---------------------------------------------------------
    def exists(self) -> bool:
        return self._read_pointer() is not None

    def last_batch_id(self) -> int | None:
        p = self._read_pointer()
        return None if p is None else p.get("last_batch_id")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Current state, or a past snapshot via ``version`` (time travel —
        any version still within the ``keep_versions`` retention horizon;
        mirrors Hudi/Delta incremental-query capability on the COW layout)."""
        p = self._read_pointer()
        if p is None:
            return None
        v = p["version"] if version is None else version
        path = self._version_dir(v)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"version {v} not available (retention keeps {self.keep_versions}; "
                f"latest is {p['version']})"
            )
        return spark.read.parquet(path)

    def versions(self) -> list[int]:
        """Committed versions still on disk, oldest first."""
        try:
            dirs = [d for d in os.listdir(self.root) if d.startswith("v_")]
        except FileNotFoundError:
            return []
        p = self._read_pointer()
        latest = p["version"] if p else 0
        return sorted(int(d[2:]) for d in dirs if int(d[2:]) <= latest)

    def diff(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental read: per-key changes between two snapshots —
        the Hudi incremental-query capability on the COW layout.

        Returns the TO-snapshot columns plus ``_change_type`` in
        ('insert', 'update', 'delete'); delete rows carry the key with
        null payload. One full-outer shuffle join on the key; change
        detection is a 64-bit row hash, so unchanged keys drop out
        without column-by-column comparison.
        """
        from pyspark.sql import functions as F

        p = self._read_pointer()
        if p is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        resolved_to = p["version"] if to_version is None else to_version
        if from_version >= resolved_to:
            raise ValueError(
                f"from_version ({from_version}) must be < to_version ({resolved_to})"
            )
        old = self.read(spark, from_version)
        new = self.read(spark, resolved_to)
        cols = new.columns

        def row_hash(df: DataFrame) -> F.Column:
            # hash a canonical JSON serialization, NOT xxhash64(*cols):
            # xxhash64 skips null children, so ('x', null) and (null, 'x')
            # would hash identically and a column-swap update would vanish
            return F.xxhash64(
                F.to_json(
                    F.struct(*[F.col(c) for c in df.columns]),
                    {"ignoreNullFields": "false"},
                )
            )

        oldh = old.select(*self.keys, row_hash(old).alias("__h_old"))
        newh = new.withColumn("__h_new", row_hash(new))
        j = newh.join(oldh, self.keys, "full_outer")
        change = (
            F.when(F.col("__h_old").isNull(), "insert")
            .when(F.col("__h_new").isNull(), "delete")
            .otherwise("update")
        )
        return (
            j.withColumn("_change_type", change)
            .filter(
                F.col("__h_old").isNull()
                | F.col("__h_new").isNull()
                | (F.col("__h_old") != F.col("__h_new"))
            )
            .select(*cols, "_change_type")
        )

    def merge_batch(self, spark: SparkSession, batch: DataFrame, batch_id: int | None = None) -> bool:
        """Upsert one normalized CDC batch; returns False if skipped
        (already-committed batch id replay, or empty batch)."""
        p = self._read_pointer()
        if (
            batch_id is not None
            and p is not None
            and p.get("last_batch_id") is not None
            and batch_id <= p["last_batch_id"]
        ):
            return False
        if batch.isEmpty():  # empty-slice gate (/root/reference/glue/cdc_hudi.py:231,246)
            return False
        existing = self.read(spark)
        merged = merge_upsert(
            existing,
            batch,
            self.keys,
            order_col=self.order_col,
            deleted_col=self.deleted_col,
            tiebreakers=self.tiebreakers,
        )
        new_version = 1 if p is None else p["version"] + 1
        os.makedirs(self.root, exist_ok=True)
        merged.write.mode("overwrite").parquet(self._version_dir(new_version))
        self._write_pointer(new_version, batch_id)
        self._prune(new_version)
        return True

    def _prune(self, current: int) -> None:
        try:
            dirs = sorted(d for d in os.listdir(self.root) if d.startswith("v_"))
        except FileNotFoundError:
            return
        for d in dirs[: -self.keep_versions]:
            if int(d[2:]) < current:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
