"""Per-table transform hooks + DimLookup broadcast enrichment: micro-batches
are joined against a dimension snapshot that refreshes on a batch cadence,
and the enriched columns land in the merged sink table."""

import json

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver
from kafka_cdc_hudi_spark.streaming.enrich import DimLookup

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("segment_id", LongType(), True),
        StructField("val", StringType(), True),
    ]
)


def dbz(op, after=None, before=None, ts_ms=0):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms, "db": "d1", "table": "t1"}
    )


def _write_dim(spark, path, rows):
    spark.createDataFrame(rows, "segment_id long, segment_name string").write.mode(
        "overwrite"
    ).parquet(path)


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_dim_lookup_validates_config():
    with pytest.raises(ValueError):
        DimLookup("/tmp/d", on="k", refresh_every=0)


def test_streaming_enrichment_with_dim_refresh(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    _write_dim(spark, dim_path, [(1, "gold"), (2, "silver")])
    src = tmp_path / "src"
    src.mkdir()
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[TableSpec("d1", "t1", ("id",))],
        sink_root=str(tmp_path / "sink"),
        checkpoint_location=str(tmp_path / "ckpt"),
        max_workers=1,
        trigger_interval="1 seconds",
    )
    driver = CdcStreamDriver(
        spark,
        cfg,
        payload_schemas={"t1": PAYLOAD},
        transform_hooks={
            "t1": DimLookup(dim_path, on="segment_id", refresh_every=1, select=["segment_name"])
        },
    )
    _write_lines(
        src / "b1.json",
        [
            dbz("c", after={"id": 1, "segment_id": 1, "val": "a"}, ts_ms=10),
            dbz("c", after={"id": 2, "segment_id": 2, "val": "b"}, ts_ms=10),
            dbz("c", after={"id": 3, "segment_id": 9, "val": "c"}, ts_ms=10),  # no dim row
        ],
    )
    q = driver.start(json_file_value_stream(spark, str(src)))
    q.processAllAvailable()
    spec = cfg.tables[0]
    state = {
        (r["id"], r["val"], r["segment_name"])
        for r in driver.sink_for(spec).read(spark).collect()
    }
    # enriched at merge time; unmatched keys survive as NULL (left join)
    assert state == {(1, "a", "gold"), (2, "b", "silver"), (3, "c", None)}

    # dimension update picked up on the refresh cadence (refresh_every=1)
    _write_dim(spark, dim_path, [(1, "platinum"), (2, "silver"), (9, "new")])
    _write_lines(
        src / "b2.json",
        [
            dbz("u", after={"id": 1, "segment_id": 1, "val": "a2"}, ts_ms=20),
            dbz("c", after={"id": 4, "segment_id": 9, "val": "d"}, ts_ms=20),
        ],
    )
    q.processAllAvailable()
    q.stop()
    state = {
        (r["id"], r["val"], r["segment_name"])
        for r in driver.sink_for(spec).read(spark).collect()
    }
    # updated rows carry the NEW dim values; untouched rows keep the values
    # they were merged with (enrich-at-ingest semantics, not a view join)
    assert state == {
        (1, "a2", "platinum"),
        (2, "b", "silver"),
        (3, "c", None),
        (4, "d", "new"),
    }
