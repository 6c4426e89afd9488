"""Batch table loading for the analytics surface + test data (TESTDATA.md).

The driver's parquet timestamp encoding has changed between rounds and may
change again, so ``load_table`` normalizes EVERY flavor to session-UTC
TIMESTAMP before anything downstream sees it:

- ``TIMESTAMP(NANOS)``: Spark has no nanos type; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the
  column surfaces as an epoch-nano long and is truncated to micros here
  (the same thing DuckDB's TIMESTAMP cast does, so oracles agree).
- ``TIMESTAMP(MICROS)`` without UTC adjustment: Spark reads TIMESTAMP_NTZ;
  cast to TIMESTAMP interprets the wall clock in the session time zone
  (UTC), matching DuckDB's naive read.
- ``TIMESTAMP(MICROS)`` UTC-adjusted: already TIMESTAMP; untouched.

Downstream operators therefore only ever handle one type, and the
NTZ-robust helpers in functions/timefns.py guard the arithmetic paths for
callers that bypass this loader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns that are timestamps-stored-as-epoch-nano-longs when the parquet
#: physical type is TIMESTAMP(NANOS) (read via the nanosAsLong legacy conf);
#: a generic schema scan can't distinguish those longs from real integers,
#: hence the explicit list
NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def normalize_timestamps(df: DataFrame, nano_long_cols: tuple[str, ...] = ()) -> DataFrame:
    """Coerce every timestamp flavor in ``df`` to session-UTC TIMESTAMP."""
    exprs = []
    changed = False
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            exprs.append(F.col(field.name).cast("timestamp").alias(field.name))
            changed = True
        elif field.name in nano_long_cols and isinstance(field.dataType, LongType):
            # integer `div`: epoch-nanos exceed double's 53-bit mantissa, so
            # float division would corrupt the microseconds
            exprs.append(
                F.expr(f"timestamp_micros(`{field.name}` div 1000)").alias(field.name)
            )
            changed = True
        else:
            exprs.append(F.col(field.name))
    return df.select(*exprs) if changed else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_timestamps(df, NANO_TS_COLS.get(name, ()))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
