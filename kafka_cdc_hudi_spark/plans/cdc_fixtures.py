"""Deterministic CDC envelope generation from the ``events`` table.

Turns the driver's parquet ``events`` rows into raw CDC JSON value-strings —
the exact input shape of the reference pipeline
(/root/reference/glue/cdc_hudi.py:95) — entirely with native expressions
(``to_json(struct(...))``), so fixtures scale with the table and stay
deterministic for the DuckDB oracle.

Op assignment (mirrored verbatim in oracle SQL — keep in sync with
plans/catalog.py):

    event_id % 10 == 0  -> delete  (Debezium 'd' / DMS 'delete')
    event_id % 10 == 1  -> create  ('c' / 'insert')
    event_id % 10 == 2  -> snapshot read ('r' / 'load')
    otherwise           -> update  ('u' / 'update')

Debezium deletes carry the row in ``before`` with ``after`` omitted (null) —
the case the reference needs its string-rewrite UDF for
(/root/reference/glue/cdc_hudi.py:165-177). DMS control records are injected
for ``event_id % 97 == 0`` (FIXTURES §A3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.timefns import epoch_millis
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: payload schema of an `events` row inside an envelope; `ts` is serialized
#: as 'yyyy-MM-dd HH:mm:ss.SSSSSS' (microsecond-exact round-trip)
EVENTS_PAYLOAD_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

def _debezium_op() -> F.Column:
    return (
        F.when(F.col("event_id") % 10 == 0, "d")
        .when(F.col("event_id") % 10 == 1, "c")
        .when(F.col("event_id") % 10 == 2, "r")
        .otherwise("u")
    )


def _dms_op() -> F.Column:
    return (
        F.when(F.col("event_id") % 10 == 0, "delete")
        .when(F.col("event_id") % 10 == 1, "insert")
        .when(F.col("event_id") % 10 == 2, "load")
        .otherwise("update")
    )


def _payload_struct() -> F.Column:
    return F.struct(
        F.col("event_id"),
        F.date_format("ts", TS_FMT).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Spread fixture rows across the cluster before the CPU-heavy
    to_json/from_json work. A real Kafka topic arrives pre-partitioned;
    the single-file parquet fixture otherwise pins the whole pipeline to
    one task.

    r14: hash-partition on a DETERMINISTIC synthetic key instead of
    keyless round-robin — round-robin pays a local sort of its input
    (``spark.sql.execution.sortBeforeRepartition``) so retried tasks
    reproduce their row assignment, and is still unsafe when a fetch
    failure re-runs part of the map stage (SPARK-38388, guide §2.5);
    ``pmod(xxhash64(event_id), 32 * parallelism)`` spreads identically
    (32x more key values than partitions), skips the sort, and is
    retry-exact. Falls back to round-robin when no ``event_id`` exists."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if "event_id" in df.columns:
        return df.repartition(
            parallelism, F.pmod(F.xxhash64("event_id"), F.lit(32 * parallelism))
        )
    return df.repartition(parallelism)


def debezium_envelopes(events: DataFrame, db: str = "test_db", table: str = "events") -> DataFrame:
    """events rows -> DataFrame[value: string] of Debezium/Flink envelopes."""
    events = _spread(events)
    p = _payload_struct()
    op = _debezium_op()
    env = F.struct(
        F.when(op == "d", p).alias("before"),  # null unless delete
        F.when(op != "d", p).alias("after"),  # null on delete (FIXTURES A1)
        op.alias("op"),
        # epoch_millis, not bare unix_millis: robust if a caller feeds raw
        # TIMESTAMP_NTZ frames (unix_millis rejects NTZ; date_format doesn't)
        epoch_millis("ts").alias("ts_ms"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
    )
    return events.select(F.to_json(env).alias("value"))


def drift_segmented_debezium_envelopes(
    events: DataFrame,
    ts_cut: str,
    db: str = "test_db",
    table: str = "events",
) -> DataFrame:
    """Mid-stream drift fixture for the SCALE soak (scripts/soak_drift.py):
    rows with ``ts < ts_cut`` serialize the ORIGINAL payload; rows at or
    past the cut serialize a payload that ADDS ``score`` (= user_id +
    1000, integral for exact oracle math) and DROPS ``props`` — a
    producer that changed shape at a deploy boundary. Time-ordered batch
    splits then put the drift at a batch boundary, so the driver's
    bounded drift probe + union-by-name schema merge run at production
    batch sizes. Deletes still carry the row in ``before`` only."""
    events = _spread(events)
    p_old = _payload_struct()
    p_new = F.struct(
        F.col("event_id"),
        F.date_format("ts", TS_FMT).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        (F.col("user_id") + 1000).alias("score"),
    )
    op = _debezium_op()

    def env(pay):
        return F.struct(
            F.when(op == "d", pay).alias("before"),
            F.when(op != "d", pay).alias("after"),
            op.alias("op"),
            epoch_millis("ts").alias("ts_ms"),
            F.lit(db).alias("db"),
            F.lit(table).alias("table"),
        )

    cut = F.col("ts") < F.lit(ts_cut).cast("timestamp")
    legacy = events.filter(cut).select(F.to_json(env(p_old)).alias("value"), "ts")
    drifted = events.filter(~cut).select(F.to_json(env(p_new)).alias("value"), "ts")
    return legacy.unionByName(drifted)


def drifted_debezium_envelopes(events: DataFrame, db: str = "test_db", table: str = "events") -> DataFrame:
    """Schema-drift fixture: odd ``event_id`` rows carry an EXTRA payload
    column ``score`` (= user_id + 1000, integral for exact oracle math);
    even rows keep the original payload — a producer that added a column
    mid-stream. Deletes (id % 10 == 0, all even) still carry the row in
    ``before`` only, so inference must union ``after``+``before``."""
    events = _spread(events)
    p = _payload_struct()
    p_ext = F.struct(
        F.col("event_id"),
        F.date_format("ts", TS_FMT).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
        (F.col("user_id") + 1000).alias("score"),
    )
    op = _debezium_op()

    def env(pay):
        return F.struct(
            F.when(op == "d", pay).alias("before"),
            F.when(op != "d", pay).alias("after"),
            op.alias("op"),
            epoch_millis("ts").alias("ts_ms"),
            F.lit(db).alias("db"),
            F.lit(table).alias("table"),
        )

    # two JSON shapes: to_json omits nothing per-row, so drifted rows must
    # serialize through the extended struct and legacy rows through the
    # original one (a single nullable `score` would emit "score":null for
    # legacy rows — not drift, just a wider schema)
    legacy = events.filter(F.col("event_id") % 2 == 0).select(
        F.to_json(env(p)).alias("value")
    )
    drifted = events.filter(F.col("event_id") % 2 == 1).select(
        F.to_json(env(p_ext)).alias("value")
    )
    return legacy.unionByName(drifted)


def dms_envelopes(
    events: DataFrame,
    db: str = "test_db",
    table: str = "events",
    inject_control_records: bool = True,
) -> DataFrame:
    """events rows -> DataFrame[value: string] of DMS envelopes.

    Every ``event_id % 97 == 0`` row is emitted as a control record instead
    of data (dropped by the engine, FIXTURES §A3.3) — note this makes those
    event rows absent from parsed output.
    """
    events = _spread(events)
    p = _payload_struct()
    is_control = (F.col("event_id") % 97 == 0) if inject_control_records else F.lit(False)
    meta = F.struct(
        F.when(is_control, F.lit("create-table")).otherwise(_dms_op()).alias("operation"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("timestamp"),
        F.when(is_control, F.lit("control")).otherwise(F.lit("data")).alias("record-type"),
        F.lit(db).alias("schema-name"),
        F.lit(table).alias("table-name"),
    )
    env = F.struct(
        F.when(~is_control, p).alias("data"),
        meta.alias("metadata"),
    )
    return events.select(F.to_json(env).alias("value"))
