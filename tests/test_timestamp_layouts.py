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
