"""Catalog sync (reference hive_sync parity): after a streaming run the
merged tables must be queryable through the Spark catalog by name —
``SELECT ... FROM db.tbl`` with no path knowledge (reference syncs every
table to Glue: /root/reference/glue/cdc_hudi.py:190-194)."""

import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec
from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("val", StringType(), True),
    ]
)


def dbz(op, after=None, before=None, ts_ms=0, db="d1", table="t1"):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms, "db": db, "table": table}
    )


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_streaming_run_syncs_catalog_cow(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[TableSpec("d1", "t1", ("id",))],
        sink_root=str(tmp_path / "sink"),
        checkpoint_location=str(tmp_path / "ckpt"),
        max_workers=1,
        catalog_sync=True,
        trigger_interval="1 seconds",
    )
    driver = CdcStreamDriver(spark, cfg, payload_schemas={"t1": PAYLOAD})
    _write_lines(
        src / "b1.json",
        [
            dbz("c", after={"id": 1, "val": "a"}, ts_ms=10),
            dbz("u", after={"id": 1, "val": "a2"}, ts_ms=30),
            dbz("c", after={"id": 2, "val": "b"}, ts_ms=10),
        ],
    )
    q = driver.start(json_file_value_stream(spark, str(src)))
    q.processAllAvailable()

    # queryable by NAME through the catalog, no path knowledge
    rows = {(r["id"], r["val"]) for r in spark.table("d1.t1").collect()}
    assert rows == {(1, "a2"), (2, "b")}
    assert spark.sql("SELECT count(*) AS n FROM d1.t1").first()["n"] == 2

    # a second commit must re-point the catalog entry to the new snapshot
    _write_lines(src / "b2.json", [dbz("d", before={"id": 1, "val": "a2"}, ts_ms=40)])
    q.processAllAvailable()
    q.stop()
    rows = {(r["id"], r["val"]) for r in spark.table("d1.t1").collect()}
    assert rows == {(2, "b")}
    spark.sql("DROP TABLE IF EXISTS d1.t1")


def test_sync_catalog_mor_registers_read_optimized(spark, tmp_path):
    t = KeyedParquetTable(str(tmp_path / "t"), keys=["id"], order_col="mtime", mode="mor")
    # no commits yet -> nothing to register
    assert t.sync_catalog(spark, "d1.m1") is None

    batch = spark.createDataFrame(
        [(1, 10, False, "x"), (2, 10, False, "y")], "id long, mtime long, _deleted boolean, val string"
    )
    t.merge_batch(spark, batch, batch_id=0)
    # delta-only MOR table: no base snapshot to expose read-optimized
    assert t.sync_catalog(spark, "d1.m1") is None

    t.compact(spark)
    reg = t.sync_catalog(spark, "d1.m1")
    assert reg == "d1.m1_ro"
    rows = {(r["id"], r["val"]) for r in spark.table("d1.m1_ro").collect()}
    assert rows == {(1, "x"), (2, "y")}
    # the catalog _ro table is exactly the read-optimized API read
    ro = {(r["id"], r["val"]) for r in t.read(spark, read_optimized=True).collect()}
    assert ro == rows
    spark.sql("DROP TABLE IF EXISTS d1.m1_ro")
