"""Optional real-Hudi sink: contract test, skip-guarded on the bundle.

In this sandbox the Hudi Spark bundle is absent and cannot be fetched
(no network for Ivy; probe evidence in README "Hudi interop"), so the
integration test skips and only the fail-fast error contract runs.
"""

import pytest

from kafka_cdc_hudi_spark.sinks.hudi import HudiKeyedTable, hudi_available


def test_fails_fast_without_bundle(spark, tmp_path):
    t = HudiKeyedTable(root=str(tmp_path / "h"), keys=["id"])
    if hudi_available(spark):
        pytest.skip("Hudi bundle present; covered by the integration test")
    df = spark.createDataFrame([(1, "a", 10, False)], "id long, val string, mtime long, _deleted boolean")
    with pytest.raises(RuntimeError, match="Hudi datasource is not on the classpath"):
        t.merge_batch(spark, df, batch_id=0)


def test_hudi_roundtrip_when_available(spark, tmp_path):
    if not hudi_available(spark):
        pytest.skip("Hudi bundle not on classpath in this environment")
    t = HudiKeyedTable(root=str(tmp_path / "h2"), keys=["id"], table_name="t_rt")
    df1 = spark.createDataFrame(
        [(1, "a", 10, False), (2, "b", 10, False)],
        "id long, val string, mtime long, _deleted boolean",
    )
    df2 = spark.createDataFrame(
        [(1, "a2", 20, False), (2, None, 20, True), (3, "c", 20, False)],
        "id long, val string, mtime long, _deleted boolean",
    )
    t.merge_batch(spark, df1, batch_id=0)
    t.merge_batch(spark, df2, batch_id=1)
    state = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert state == {1: "a2", 3: "c"}
