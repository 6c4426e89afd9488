"""Batch table loading for the analytics surface + test data (TESTDATA.md).

The driver's parquet stores timestamps as TIMESTAMP(NANOS), which Spark has
no native type for; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set
in session.py) they surface as epoch-nano longs and are converted here to
microsecond timestamps (truncation — the same thing DuckDB's TIMESTAMP cast
does, so oracle comparisons agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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

#: columns stored as TIMESTAMP(NANOS) in the testdata parquet
NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANO_TS_COLS.get(name, ()):
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            # integer `div`: epoch-nanos exceed double's 53-bit mantissa, so
            # float division would corrupt the microseconds
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
