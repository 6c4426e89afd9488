"""Operator unit tests for CDC parsing/routing/dedup (FIXTURES §A scenarios)."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, DIALECT_DMS
from kafka_cdc_hudi_spark.operators.cdc import (
    infer_json_schema,
    parse_debezium,
    parse_dms,
    parse_stream,
    raw_route_prefilter,
    route,
)
from kafka_cdc_hudi_spark.operators.dedup import latest_per_key, latest_per_key_agg

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("k2", StringType(), True),
        StructField("val", StringType(), True),
    ]
)


def _value_df(spark, envelopes):
    return spark.createDataFrame([(json.dumps(e),) for e in envelopes], "value string")


def dbz(op, after=None, before=None, ts_ms=0, db="d1", table="t1"):
    return {"before": before, "after": after, "op": op, "ts_ms": ts_ms, "db": db, "table": table}


def dms(op, data=None, ts="2024-01-01T00:00:00.000000Z", rtype="data", db="d1", table="t1"):
    return {
        "data": data,
        "metadata": {
            "operation": op,
            "timestamp": ts,
            "record-type": rtype,
            "schema-name": db,
            "table-name": table,
        },
    }


ROW = {"id": 1, "k2": "a", "val": "v1"}


class TestDebeziumParse:
    def test_all_op_codes_kept(self, spark):
        df = _value_df(
            spark,
            [
                dbz("c", after=ROW, ts_ms=1),
                dbz("u", after={**ROW, "val": "v2"}, before=ROW, ts_ms=2),
                dbz("r", after=ROW, ts_ms=3),
                dbz("d", before=ROW, ts_ms=4),  # after null
            ],
        )
        out = parse_debezium(df, PAYLOAD).orderBy("mtime").collect()
        assert [r["operation"] for r in out] == ["c", "u", "r", "d"]
        assert [r["_deleted"] for r in out] == [False, False, False, True]
        # delete recovered full row from `before` (FIXTURES A3.2)
        assert out[3]["id"] == 1 and out[3]["val"] == "v1"

    def test_tombstone_dropped(self, spark):
        df = _value_df(spark, [dbz("d", ts_ms=1), dbz("c", after=ROW, ts_ms=2)])
        out = parse_debezium(df, PAYLOAD).collect()
        assert len(out) == 1 and out[0]["operation"] == "c"

    def test_unknown_op_dropped(self, spark):
        df = _value_df(spark, [dbz("x", after=ROW, ts_ms=1), dbz("u", after=ROW, ts_ms=2)])
        assert parse_debezium(df, PAYLOAD).count() == 1

    def test_missing_payload_columns_null(self, spark):
        # schema drift: envelope missing `val` parses with null (A3.8)
        df = _value_df(spark, [dbz("c", after={"id": 5, "k2": "z"}, ts_ms=9)])
        row = parse_debezium(df, PAYLOAD).collect()[0]
        assert row["id"] == 5 and row["val"] is None


class TestDmsParse:
    def test_ops_and_control(self, spark):
        df = _value_df(
            spark,
            [
                dms("load", data=ROW, ts="2024-01-01T00:00:01.000000Z"),
                dms("insert", data=ROW, ts="2024-01-01T00:00:02.000000Z"),
                dms("update", data={**ROW, "val": "v2"}, ts="2024-01-01T00:00:03.000000Z"),
                dms("delete", data=ROW, ts="2024-01-01T00:00:04.000000Z"),
                dms("create-table", rtype="control"),  # dropped (A3.3)
            ],
        )
        out = parse_dms(df, PAYLOAD).orderBy("mtime").collect()
        assert [r["operation"] for r in out] == ["load", "insert", "update", "delete"]
        assert [r["_deleted"] for r in out] == [False, False, False, True]

    def test_mtime_is_iso_string(self, spark):
        df = _value_df(spark, [dms("insert", data=ROW, ts="2024-06-01T10:00:00.123456Z")])
        row = parse_dms(df, PAYLOAD).collect()[0]
        assert row["mtime"] == "2024-06-01T10:00:00.123456Z"


class TestRouting:
    def test_route_multitable(self, spark):
        df = _value_df(
            spark,
            [
                dbz("c", after=ROW, ts_ms=1, table="t1"),
                dbz("c", after=ROW, ts_ms=2, table="t2"),
                dbz("c", after=ROW, ts_ms=3, db="d2", table="t1"),
            ],
        )
        parsed = parse_stream(df, DIALECT_DEBEZIUM, PAYLOAD, keep_routing=True)
        assert route(parsed, "d1", "t1").count() == 1
        assert route(parsed, "d1", "t2").count() == 1
        assert route(parsed, "d2", "t1").count() == 1
        assert "_db" not in route(parsed, "d1", "t1").columns

    def test_raw_prefilter_superset(self, spark):
        rows = [
            dbz("c", after=ROW, ts_ms=1, table="t1"),
            dbz("c", after=ROW, ts_ms=2, table="t2"),
            # db value appearing inside payload must not be dropped by the
            # prefilter for t1 (it is a superset filter only)
            dbz("c", after={**ROW, "val": '"table":"t1"'}, ts_ms=3, table="t2"),
        ]
        df = _value_df(spark, rows)
        pre = raw_route_prefilter(df, "d1", "t1", DIALECT_DEBEZIUM)
        assert pre.count() >= 1
        parsed = parse_stream(pre, DIALECT_DEBEZIUM, PAYLOAD, keep_routing=True)
        assert route(parsed, "d1", "t1").count() == 1

    def test_dms_routing_fields(self, spark):
        df = _value_df(
            spark,
            [dms("insert", data=ROW, db="dbA", table="tabA"), dms("insert", data=ROW)],
        )
        parsed = parse_stream(df, DIALECT_DMS, PAYLOAD, keep_routing=True)
        assert route(parsed, "dbA", "tabA").count() == 1


class TestDedup:
    def _df(self, spark):
        rows = [
            # key (1,'a'): three events out of order -> keep mtime 30
            (1, "a", "old", 10),
            (1, "a", "newest", 30),
            (1, "a", "mid", 20),
            # key (1,'b'): single
            (1, "b", "only", 5),
            # key (2,'a'): tie on mtime -> tiebreaker val desc
            (2, "a", "t1", 7),
            (2, "a", "t2", 7),
        ]
        return spark.createDataFrame(rows, "id long, k2 string, val string, mtime long")

    def test_latest_per_key_window(self, spark):
        out = latest_per_key(self._df(spark), ["id", "k2"], "mtime", tiebreakers=["val"])
        got = {(r["id"], r["k2"]): r["val"] for r in out.collect()}
        assert got == {(1, "a"): "newest", (1, "b"): "only", (2, "a"): "t2"}

    def test_latest_per_key_agg_matches_window(self, spark):
        df = self._df(spark)
        a = latest_per_key(df, ["id", "k2"], "mtime", tiebreakers=["val"])
        b = latest_per_key_agg(df, ["id", "k2"], "mtime", tiebreakers=["val"])
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestSchemaInference:
    def test_infer_drifted_schema(self, spark):
        # new column `extra` appears mid-stream (A3.8)
        df = _value_df(
            spark,
            [
                dbz("c", after=ROW, ts_ms=1),
                dbz("c", after={**ROW, "extra": 42}, ts_ms=2),
            ],
        )
        env = infer_json_schema(spark, df)
        after = dict(zip(env["after"].dataType.names, range(10)))
        assert "extra" in after
        payload = env["after"].dataType
        out = parse_debezium(df, payload, json_options={})
        assert "extra" in out.columns
        assert out.filter(F.col("extra") == 42).count() == 1

    def test_merge_schemas_keeps_type_and_warns_on_retype(self, caplog):
        import logging

        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from kafka_cdc_hudi_spark.operators.cdc import merge_payload_schemas

        old = StructType([StructField("a", LongType()), StructField("b", StringType())])
        new = StructType([StructField("a", StringType()), StructField("c", LongType())])
        with caplog.at_level(logging.WARNING, "kafka_cdc_hudi_spark.operators.cdc"):
            merged = merge_payload_schemas(old, new)
        # established type kept, new field appended, retype observable in logs
        assert [f.name for f in merged.fields] == ["a", "b", "c"]
        assert merged["a"].dataType == LongType()
        assert any("RETYPED" in r.message and "a: bigint -> string" in r.message
                   for r in caplog.records)

    def test_merge_schemas_strict_raises_on_retype(self):
        import pytest
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from kafka_cdc_hudi_spark.operators.cdc import merge_payload_schemas

        old = StructType([StructField("a", LongType())])
        new = StructType([StructField("a", StringType())])
        with pytest.raises(ValueError, match="RETYPED"):
            merge_payload_schemas(old, new, strict=True)
        # no retype -> strict is silent
        ok = merge_payload_schemas(old, old, strict=True)
        assert ok == old


class TestDmsMergeE2E:
    """Non-vacuity for cdc_merge_dms_e2e (VERDICT r8 item 6): the fixture
    must actually exercise control-record drops, `load` ops, delete
    tombstones, and a LOAD-BEARING route (the foreign stream's perturbed
    payloads must be provably present pre-route and absent post-route)."""

    def test_fixture_exercises_every_dms_semantic(self, spark):
        from pyspark.sql import functions as F

        from kafka_cdc_hudi_spark.config import DIALECT_DMS
        from kafka_cdc_hudi_spark.operators.cdc import (
            parse_dms,
            raw_route_prefilter,
        )
        from kafka_cdc_hudi_spark.plans.catalog_cdc import (
            _events,
            cdc_merge_dms_e2e,
        )
        from kafka_cdc_hudi_spark.plans.cdc_fixtures import (
            EVENTS_PAYLOAD_SCHEMA,
            dms_envelopes,
        )

        from .conftest import SF_DIR

        final = cdc_merge_dms_e2e(spark, SF_DIR).cache()
        try:
            assert final.count() > 0
            # `load` ops (event_id % 10 == 2) survive as upserts
            assert final.filter(F.col("event_id") % 10 == 2).count() > 0
            # delete tombstones bite on the REAL operator with the DMS
            # string-mtime precombine: every delete has even event_id
            # (%10==0), so all tombstones land in batch A — a user whose
            # latest even-batch row is a delete must be absent from the
            # batch-A state s1. (The FINAL state may legitimately resurrect
            # such users from older odd-batch rows — the documented COW
            # position-split semantic — which the registry oracle pins.)
            from pyspark.sql.window import Window

            from kafka_cdc_hudi_spark.operators.merge import merge_upsert
            from kafka_cdc_hudi_spark.plans.cdc_fixtures import (
                dms_envelopes as _envs,
            )

            own_parsed = parse_dms(
                _envs(_events(spark, SF_DIR)), EVENTS_PAYLOAD_SCHEMA
            )
            a = own_parsed.filter(F.col("event_id") % 2 == 0).drop("operation")
            s1 = merge_upsert(None, a, ["user_id"], tiebreakers=["event_id"])
            even_latest_del = (
                a.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("user_id").orderBy(
                            F.col("mtime").desc(), F.col("event_id").desc()
                        )
                    ),
                )
                .filter((F.col("rn") == 1) & F.col("_deleted"))
                .select("user_id")
            )
            assert even_latest_del.count() > 0, "no tombstoned users — vacuous"
            assert s1.join(even_latest_del, "user_id", "left_semi").count() == 0
            # route is load-bearing: foreign perturbed values (>= 1e6) are in
            # the pre-route stream but never reach the final state
            assert final.agg(F.max("value")).first()[0] < 1_000_000.0
        finally:
            final.unpersist()
        foreign_env = dms_envelopes(
            _events(spark, SF_DIR)
            .filter(F.col("event_id") % 5 == 0)
            .withColumn("value", F.col("value") + F.lit(1_000_000.0)),
            table="events_mirror",
        )
        unrouted = parse_dms(foreign_env, EVENTS_PAYLOAD_SCHEMA, keep_routing=True)
        assert unrouted.agg(F.max("value")).first()[0] >= 1_000_000.0
        # control records (event_id % 97 == 0) never parse out
        own = parse_dms(
            dms_envelopes(_events(spark, SF_DIR)), EVENTS_PAYLOAD_SCHEMA
        )
        assert own.filter(F.col("event_id") % 97 == 0).count() == 0
        # the raw prefilter rejects unknown dialect strings instead of
        # silently filtering a DMS stream to zero rows
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown CDC dialect"):
            raw_route_prefilter(foreign_env, "test_db", "events", dialect="dms")
        # and for the real DMS dialect it drops the foreign table's rows
        # before parsing (scan-reduction hint, exact routing still post-parse)
        assert (
            raw_route_prefilter(
                foreign_env, "test_db", "events", dialect=DIALECT_DMS
            ).count()
            == 0
        )
