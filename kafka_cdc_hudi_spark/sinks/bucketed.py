"""Bucketed table write/read — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Spark's bucketing pre-partitions (and optionally pre-sorts) the
stored table by the join key into a fixed bucket count; two tables
bucketed the same way join with ZERO exchange — each task reads matching
bucket files from both sides. This is the storage-level answer to
"repeated joins on the same key": pay one shuffle at write time, then
every subsequent join is exchange-free (the pattern Hive/Hudi/Iceberg
users apply to their biggest fact tables).

Requirements Spark imposes (encoded here rather than left as tribal
knowledge): bucketed output must go through ``saveAsTable`` (bucket
metadata lives in the catalog, not the files), both sides must have the
same bucket count on the join key, and `spark.sql.sources.bucketing.enabled`
(default true) governs whether scans expose the bucketing to the planner.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by ``keys``.
    One shuffle-equivalent cost now; exchange-free equi-joins on ``keys``
    against any table bucketed with the same ``n_buckets`` afterwards."""
    keys = list(keys)
    w = df.write.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table with its bucket spec intact (plain
    ``spark.read.parquet`` on the files would lose it — the spec lives in
    the catalog entry)."""
    return spark.table(table)
