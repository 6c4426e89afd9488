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
