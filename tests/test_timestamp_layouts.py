"""load_table must normalize EVERY parquet timestamp encoding to the same
session-UTC TIMESTAMP values — the harness has changed the physical type
twice (TIMESTAMP(NANOS) -> read as long via nanosAsLong; then
TIMESTAMP(MICROS) non-UTC-adjusted -> TIMESTAMP_NTZ), so all three layouts
are pinned here against identical downstream results."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import TimestampType

from kafka_cdc_hudi_spark.functions.timefns import epoch_millis, epoch_seconds
from kafka_cdc_hudi_spark.sources.tables import load_table

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 6, 15, 23, 59, 59, 999999),
    datetime.datetime(2025, 12, 31, 12, 0, 0, 1),
]


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp("us")).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return tmpdir


LAYOUTS = {
    "micros_ntz": pa.timestamp("us"),  # current harness layout -> TIMESTAMP_NTZ
    "nanos": pa.timestamp("ns"),  # old harness layout -> long via nanosAsLong
    "micros_utc": pa.timestamp("us", tz="UTC"),  # plain TIMESTAMP
}


@pytest.mark.parametrize("layout", LAYOUTS)
def test_layout_normalizes_to_utc_timestamp(spark, tmp_path, layout):
    (tmp_path / layout).mkdir()
    _write_events(str(tmp_path / layout), LAYOUTS[layout])
    df = load_table(spark, str(tmp_path / layout), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), layout
    rows = df.orderBy("event_id").collect()
    assert [r["ts"] for r in rows] == _TS, layout


def test_floordiv_long_exact_beyond_double_precision(spark):
    """floordiv_long must stay exact where floor(a/b) on doubles rounds:
    values past 2^53, negative values (floor, not truncate), and both small
    and large divisors."""
    import pyspark.sql.functions as F

    from kafka_cdc_hudi_spark.functions.timefns import floordiv_long

    cases = [
        (2**53 + 1, 2048),          # smallest double-unrepresentable long
        (2**62 + 12345, 2048),      # deep past 2^53, small divisor
        (2**62 + 12345, 3_600_000_000),  # hour-of-micros divisor
        (-7, 3),                    # floor(-7/3) = -3, not trunc -2
        (-(2**53) - 1, 2048),
        (0, 5),
        (9_223_372_036_854_775_807, 7),  # Long.MAX
    ]
    df = spark.createDataFrame([(a, b) for a, b in cases], "a long, b long")
    rows = []
    for a, b in cases:
        got = (
            df.filter((F.col("a") == a) & (F.col("b") == b))
            .select(floordiv_long(F.col("a"), b).alias("q"))
            .collect()[0]["q"]
        )
        rows.append((a, b, got, a // b))
    for a, b, got, want in rows:
        assert got == want, f"floordiv_long({a}, {b}) = {got}, want {want}"


def test_all_layouts_agree_downstream(spark, tmp_path):
    """Same values AND working arithmetic (epoch_millis / epoch_seconds /
    date arithmetic) through every physical layout."""
    results = {}
    for layout, ts_type in LAYOUTS.items():
        (tmp_path / layout).mkdir()
        _write_events(str(tmp_path / layout), ts_type)
        df = load_table(spark, str(tmp_path / layout), "events")
        out = df.select(
            "event_id",
            epoch_millis("ts").alias("ms"),
            epoch_seconds("ts").alias("secs"),
        ).orderBy("event_id")
        results[layout] = [tuple(r) for r in out.collect()]
    base = results["micros_utc"]
    assert base[0][1] == 1704067200123  # 2024-01-01T00:00:00.123456Z in ms
    for layout, rows in results.items():
        assert rows == base, f"{layout} diverges from micros_utc"
