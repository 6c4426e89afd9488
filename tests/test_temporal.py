"""As-of join operator: semantics on a hand-built frame + plan shape."""

from pyspark.sql import Row

from kafka_cdc_hudi_spark.operators.temporal import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=5, name="a"), Row(k=1, ts=10, name="b"), Row(k=1, ts=3, name="c"),
         Row(k=2, ts=7, name="d")]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=5, px=100.0), Row(k=1, ts=9, px=200.0), Row(k=3, ts=1, px=9.0)]
    )
    out = {r["name"]: (r["asof_ts"], r["asof_px"]) for r in
           asof_join(left, right, on=["k"], prefix="asof_").collect()}
    assert out == {
        "a": (5, 100.0),   # inclusive: equal ts matches
        "b": (9, 200.0),   # latest preceding
        "c": (None, None),  # nothing at or before ts=3
        "d": (None, None),  # key has no right rows
    }


def test_asof_null_right_ts_and_keys_never_match(spark):
    left = spark.createDataFrame([Row(k=1, ts=5, name="a"), Row(k=None, ts=5, name="b")])
    right = spark.createDataFrame(
        [Row(k=1, ts=None, px=99.0), Row(k=None, ts=3, px=7.0)]
    )
    out = {r["name"]: (r["asof_ts"], r["asof_px"]) for r in
           asof_join(left, right, on=["k"], prefix="asof_").collect()}
    # null right_ts row is not "the earliest match"; null keys don't pair
    assert out == {"a": (None, None), "b": (None, None)}


def test_asof_single_shuffle(spark):
    left = spark.range(100).selectExpr("id % 5 AS k", "id AS ts", "id AS v")
    right = spark.range(20).selectExpr("id % 5 AS k", "id * 3 AS ts", "id AS px")
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # union + one window: exactly one hash-partitioning exchange, no join op
    assert plan.count("hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_buckets_and_boundaries(spark):
    from kafka_cdc_hudi_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 3600), (3, 1, 7199), (4, 1, 7200), (5, 2, 100), (6, None, 50)],
        "event_id int, k int, ts int",
    )
    # interval spans 2 buckets (3600s each); half-open [0, 7200)
    intervals = spark.createDataFrame(
        [(1, 0, 7200, "a"), (2, None, 100, "b"), (None, 0, 100, "c")],
        "k int, start int, end int, tag string",
    )
    out = {(r["event_id"], r["tag"]) for r in
           range_join(left, intervals, on=["k"], left_ts="ts",
                      start_col="start", end_col="end", bucket_seconds=3600).collect()}
    # ts=0,3600,7199 inside [0,7200); 7200 excluded (half-open); null
    # bounds/keys never match
    assert out == {(1, "a"), (2, "a"), (3, "a")}


def test_scd2_history_semantics(spark):
    """SCD2 invariants on the Debezium stream: per key the emitted
    intervals are strictly ordered and non-overlapping; a key has exactly
    one current version iff its LAST change was not a delete (tombstones
    close history without opening any); and the fixture exercises all
    three cases (current, closed, delete-terminated)."""
    from collections import defaultdict

    from kafka_cdc_hudi_spark.operators.cdc import parse_debezium
    from kafka_cdc_hudi_spark.plans.catalog_cdc import (
        EVENTS_PAYLOAD_SCHEMA,
        cdc_scd2_history,
        _events,
    )
    from kafka_cdc_hudi_spark.plans.cdc_fixtures import debezium_envelopes

    from .conftest import SF_DIR

    rows = cdc_scd2_history(spark, SF_DIR).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.user_id].append(r)
    closed = current = 0
    for k, vs in by_key.items():
        vs.sort(key=lambda r: (r.valid_from, r.event_id))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from, (k, a, b)
        current += sum(1 for v in vs if v.is_current)
        closed += sum(1 for v in vs if not v.is_current)
        assert sum(1 for v in vs if v.is_current) <= 1, k

    parsed = parse_debezium(
        debezium_envelopes(_events(spark, SF_DIR)), EVENTS_PAYLOAD_SCHEMA
    ).select("user_id", "ts", "event_id", "_deleted").collect()
    last_op = {}
    for r in sorted(parsed, key=lambda r: (r.ts, r.event_id)):
        last_op[r.user_id] = bool(r._deleted)
    want_current = sum(1 for v in last_op.values() if not v)
    assert current == want_current, (current, want_current)
    terminated = [k for k, d in last_op.items() if d]
    assert terminated, "no delete-terminated key in fixture — vacuous"
    assert closed > 0 and current > 0
    for k in terminated:
        assert all(not v.is_current for v in by_key.get(k, [])), k
