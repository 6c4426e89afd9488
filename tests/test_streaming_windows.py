"""Event-time streaming operators: batch-mode oracle checks + real
streaming runs through a file source with late data."""

import json

import pytest
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.sources.tables import load_table
from kafka_cdc_hudi_spark.streaming.windows import (
    running_user_stats,
    session_windows,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

from .conftest import SF_DIR
from .oracle_harness import duckdb_con


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def test_tumbling_counts_batch_oracle(spark, events, con):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in tumbling_counts(events).collect()
    }
    exp = {
        (w, t): (n, round(s, 6))
        for (w, t, n, s) in con.sql(
            "SELECT date_trunc('hour', ts), event_type, count(*), sum(value) "
            "FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    assert got == exp


def test_sliding_windows_overlap(spark, events):
    out = sliding_counts(events, window="1 hour", slide="30 minutes").collect()
    # every event lands in exactly window/slide = 2 windows
    assert sum(r["n_events"] for r in out) == 2 * events.count()


def test_session_windows_batch(spark, events):
    out = session_windows(events, gap="30 minutes")
    rows = out.collect()
    assert all(r["session_end"] > r["session_start"] for r in rows)
    # sessions per user cover all that user's events
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + r["n_events"]
    exp = {r["user_id"]: r["n"] for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user == exp


def test_streaming_tumbling_with_late_data(spark, tmp_path):
    """Real stream: late event within watermark is still aggregated."""
    src = tmp_path / "src"
    src.mkdir()
    lines1 = [
        json.dumps({"ts": "2024-01-01 10:05:00", "event_type": "click", "value": 1.0, "user_id": 1}),
        json.dumps({"ts": "2024-01-01 10:55:00", "event_type": "click", "value": 2.0, "user_id": 2}),
        json.dumps({"ts": "2024-01-01 11:05:00", "event_type": "click", "value": 4.0, "user_id": 1}),
    ]
    (src / "b1.json").write_text("\n".join(lines1))
    schema = "ts timestamp, event_type string, value double, user_id long"
    stream = (
        spark.readStream.format("json").schema(schema).option("maxFilesPerTrigger", "1").load(str(src))
    )
    agg = tumbling_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # late event for the 10:00 window arrives while watermark still open
    (src / "b2.json").write_text(
        json.dumps({"ts": "2024-01-01 10:40:00", "event_type": "click", "value": 8.0, "user_id": 3})
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from tumbling_test").collect()
    by_window = {}
    for r in rows:  # update mode: keep the last emit per window
        by_window[(r["window_start"].hour, r["event_type"])] = (r["n_events"], r["sum_value"])
    assert by_window[(10, "click")] == (3, 11.0)  # late event counted
    assert by_window[(11, "click")] == (1, 4.0)


def test_streaming_dedup_batch_and_stream(spark, events, tmp_path):
    # batch path
    d = streaming_dedup(events.unionByName(events), ["event_id"])
    assert d.count() == events.count()
    # stream path: duplicate key in a later file is dropped
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"ts": "2024-01-01 10:05:00", "event_id": 1, "value": 1.0})
    )
    (src / "b2.json").write_text(
        "\n".join(
            [
                json.dumps({"ts": "2024-01-01 10:06:00", "event_id": 1, "value": 99.0}),
                json.dumps({"ts": "2024-01-01 10:07:00", "event_id": 2, "value": 2.0}),
            ]
        )
    )
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    q = (
        streaming_dedup(stream, ["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select event_id, value from dedup_test").collect()
    got = {(r["event_id"], r["value"]) for r in rows}
    assert got == {(1, 1.0), (2, 2.0)}


def test_interval_join_two_streams_matches_batch(spark, tmp_path):
    """Stream-stream interval join (click attribution shape): purchases
    within 30 min after a click by the same user, two real file streams,
    compared against the same builder on batch frames."""
    from kafka_cdc_hudi_spark.streaming.windows import interval_join_streams

    clicks = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "click_id": 100},
        {"user_id": 2, "ts": "2024-01-01 10:05:00", "click_id": 200},
        {"user_id": 1, "ts": "2024-01-01 12:00:00", "click_id": 101},
    ]
    purchases = [
        {"user_id": 1, "ts": "2024-01-01 10:20:00", "purchase_id": 900},  # joins 100
        {"user_id": 2, "ts": "2024-01-01 11:00:00", "purchase_id": 901},  # outside 30m
        {"user_id": 1, "ts": "2024-01-01 12:10:00", "purchase_id": 902},  # joins 101
    ]
    csrc, psrc = tmp_path / "clicks", tmp_path / "purch"
    csrc.mkdir(); psrc.mkdir()
    (csrc / "c.json").write_text("\n".join(json.dumps(c) for c in clicks))
    (psrc / "p.json").write_text("\n".join(json.dumps(p) for p in purchases))
    cs = "user_id long, ts timestamp, click_id long"
    ps = "user_id long, ts timestamp, purchase_id long"

    def run(left, right):
        return interval_join_streams(
            left, right, on=["user_id"], within="30 minutes", watermark="2 hours"
        )

    # batch oracle path (string ts -> cast)
    lb = spark.createDataFrame(
        [tuple(c.values()) for c in clicks], "user_id long, ts string, click_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rb = spark.createDataFrame(
        [tuple(p.values()) for p in purchases], "user_id long, ts string, purchase_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    exp = {
        (r["click_id"], r["purchase_id"]) for r in run(lb, rb).collect()
    }
    assert exp == {(100, 900), (101, 902)}

    lstream = spark.readStream.format("json").schema(cs).load(str(csrc))
    rstream = spark.readStream.format("json").schema(ps).load(str(psrc))
    q = (
        run(lstream, rstream)
        .writeStream.format("memory")
        .queryName("sj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("select click_id, purchase_id from sj_test").collect()
    }
    assert got == exp


def test_running_user_stats_stateful(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            [
                json.dumps({"ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "click", "value": 1.0}),
                json.dumps({"ts": "2024-01-01 10:01:00", "user_id": 1, "event_type": "buy", "value": 2.0}),
                json.dumps({"ts": "2024-01-01 10:02:00", "user_id": 2, "event_type": "click", "value": 5.0}),
            ]
        )
    )
    (src / "b2.json").write_text(
        json.dumps({"ts": "2024-01-01 10:03:00", "user_id": 1, "event_type": "view", "value": 4.0})
    )
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("stats_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from stats_test").collect()
    last = {}
    for r in rows:  # cross-batch state: later emits override
        last[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_event_type"])
    assert last[1] == (3, 7.0, "view")
    assert last[2] == (1, 5.0, "click")
