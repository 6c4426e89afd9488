"""Event-time streaming operators: watermarked windowed aggregation,
streaming dedup, and a custom stateful operator via
``applyInPandasWithState``.

The reference has NO event-time processing (SURVEY §2 "not implemented") —
all cross-batch state is delegated to Hudi precombine. These operators are
the M6/north-star extension: the standard Structured Streaming toolkit a
large-scale events pipeline needs, expressed so the same builders work on a
batch frame (tests/oracle) and on a stream (watermark applies only when
``df.isStreaming``).

Scale notes: watermark + windowed agg keeps state bounded to
(watermark-horizon / slide) windows per key; session windows use
``session_window`` (state merges adjacent gaps); the stateful op keeps one
compact row per key with an explicit timeout — at 100 TB cardinality the
key space must be pre-hashed/partitioned, which groupBy already does.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.numeric import dsum as _dsum
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    if delay and df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts + value sum per key."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), _dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding event-time windows (overlapping)."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: events for a key separated by < gap merge into one
    session."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), _dsum("value", "sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    df: DataFrame, keys: Iterable[str], ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once-per-key events within the watermark horizon
    (``dropDuplicatesWithinWatermark`` on streams). State is bounded by the
    watermark — the streaming counterpart of the CDC in-batch dedup (O15).

    The batch path keeps the EARLIEST event per key (min event time, content
    hash as the deterministic tie-break) rather than ``dropDuplicates``'s
    arbitrary row: for an in-order source that's exactly what the stream's
    first-arrival-wins produces, so batch output is a usable oracle for the
    stream."""
    keys = list(keys)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc_nulls_last(),
        F.xxhash64(
            F.to_json(F.struct(*[F.col(c) for c in df.columns]), {"ignoreNullFields": "false"})
        ),
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: Iterable[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: right events within
    ``[left_ts, left_ts + within]`` for the same key (click-attribution
    shape). On streams BOTH sides carry watermarks and the time-range
    predicate is the form Spark's streaming joiner needs to derive a state
    eviction bound — without it state grows forever; with it each side
    buffers only the watermark + interval horizon. The same builder runs on
    batch frames (no watermark) as the oracle path — the batch shape is the
    bucketed ``range_join`` family (operators/temporal.py) but expressed as
    a direct time-condition join, which Spark plans hash-join + filter on
    the equi-keys here (no row explosion: the key join is the narrow part).

    Right columns are suffixed ``_r`` on name collisions.
    """
    on = list(on)
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    collide = {c for c in r.columns if c in l.columns and c not in on}
    for c in collide:
        r = r.withColumnRenamed(c, f"{c}_r")
    rts = f"{right_ts}_r" if right_ts in collide else right_ts
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (r[rts] >= l[left_ts])
        & (r[rts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    joined = l.join(r, cond, how)
    # drop the duplicated right-side key columns
    return joined.drop(*[r[k] for k in on])


# -- custom stateful operator -------------------------------------------------

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
        StructField("last_event_type", StringType(), True),
    ]
)

_STATE_SCHEMA = "n BIGINT, s DOUBLE, last_ts TIMESTAMP, last_type STRING"


def _make_running_stats_fn(idle_timeout_ms: int | None):
    def _running_stats_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-key running aggregate — the template for custom cross-batch
        state the reference delegates to Hudi."""
        if state.hasTimedOut:
            state.remove()
            return
        n, s, last_ts, last_type = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            # max-merge the "last event" against prior state AND every chunk:
            # a key can arrive as multiple Arrow chunks, and a late event
            # must never regress last_ts below what the state already saw
            idx = pdf["ts"].idxmax()
            chunk_ts = pdf["ts"].loc[idx].to_pydatetime()
            if last_ts is None or chunk_ts >= last_ts:
                last_ts = chunk_ts
                last_type = str(pdf["event_type"].loc[idx])
        state.update((n, s, last_ts, last_type))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [last_ts],
                "last_event_type": [last_type],
            }
        )

    return _running_stats_fn


def running_user_stats(df: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful streaming op: per-user running stats via
    ``applyInPandasWithState`` (Arrow-batched, explicit state schema).

    ``idle_timeout_ms`` enables processing-time state eviction for unbounded
    key spaces (set it in production with a continuous trigger). Default off:
    with a timeout configured, the micro-batch engine schedules endless
    no-data "cleaning up state" batches, so ``processAllAvailable()`` —
    and any drain-the-source batch run — never returns.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            _make_running_stats_fn(idle_timeout_ms),
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
