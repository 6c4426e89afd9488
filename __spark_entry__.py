"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``kafka_cdc_hudi_spark/`` (plans/catalog.py is the
registry); this file is only the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_confs(spark: SparkSession) -> SparkSession:
    """Confs the engine needs that the driver's session may not set."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # testdata parquet is TIMESTAMP(NANOS); see sources/tables.py
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC capability end-to-end — events -> Debezium JSON
    envelopes -> declarative parse (delete recovery) -> two-batch keyed
    merge with precombine semantics (fused one-pass fold, r14) -> final
    table state."""
    from kafka_cdc_hudi_spark.plans.catalog_cdc import cdc_merge_two_batches

    return cdc_merge_two_batches(_ensure_confs(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_cdc_hudi_spark.plans import catalog

    def wrap(fn):
        return lambda spark, sf_dir: fn(_ensure_confs(spark), sf_dir)

    return {name: wrap(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    from kafka_cdc_hudi_spark.plans import catalog

    return catalog.oracle_sql()
