"""End-to-end test of the job-launcher CLI (python -m kafka_cdc_hudi_spark):
properties file -> file-source stream -> drained merge -> stored state."""

import json

from kafka_cdc_hudi_spark.__main__ import main
from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable


def _dbz(op, payload, ts_ms, table="t1"):
    return json.dumps(
        {
            "before": payload if op == "d" else None,
            "after": None if op == "d" else payload,
            "op": op,
            "ts_ms": ts_ms,
            "db": "d1",
            "table": table,
        }
    )


def test_cli_drain_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            [
                _dbz("c", {"id": 1, "val": "a"}, 10),
                _dbz("u", {"id": 1, "val": "a2"}, 30),
                _dbz("c", {"id": 2, "val": "b"}, 10),
                _dbz("d", {"id": 2, "val": "b"}, 40),
            ]
        )
        + "\n"
    )
    props = tmp_path / "job.properties"
    props.write_text(
        "\n".join(
            [
                "cdc_format = MSK-DEBEZIUM-CDC",
                f"sink_root = {tmp_path / 'sink'}",
                f"checkpoint_location = {tmp_path / 'ckpt'}",
                "checkpoint_interval = 0 seconds",
                "thread_max_workers = 2",
                'sync_table_list = [{"db_name": "d1", "table_name": "t1", "primary_key": "id"}]',
            ]
        )
        + "\n"
    )
    rc = main(["--properties", str(props), "--source-dir", str(src), "--drain"])
    assert rc == 0
    t = KeyedParquetTable(root=f"{tmp_path / 'sink'}/d1/t1", keys=["id"])
    state = {(r["id"], r["val"]) for r in t.read(spark).collect()}
    assert state == {(1, "a2")}


def test_cli_errors_without_source(tmp_path):
    import pytest

    props = tmp_path / "job.properties"
    props.write_text(
        'sync_table_list = [{"db_name": "d1", "table_name": "t1", "primary_key": "id"}]\n'
    )
    with pytest.raises(SystemExit):
        main(["--properties", str(props), "--drain"])
