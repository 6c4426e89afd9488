"""Kafka source contract (O1-O3). No broker exists in this sandbox and the
pip pyspark wheel ships without the Kafka connector jar, so:

- the error-rewrap contract (clear guidance when the connector is absent)
  IS testable here and is pinned below;
- the live end-to-end path is codified behind a skip guard keyed on
  ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` — it runs wherever a broker + connector
  exist, asserting the ``DataFrame[value: string]`` contract the whole
  pipeline is built on (the same contract the file stand-in drives in
  every streaming test).
"""

import os

import pytest

from kafka_cdc_hudi_spark.sources.kafka import kafka_value_stream

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _connector_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_missing_connector_error_is_rewrapped(spark):
    if _connector_present(spark):
        pytest.skip("Kafka connector on classpath; rewrap path not reachable")
    with pytest.raises(RuntimeError, match="Kafka connector is not on the classpath"):
        kafka_value_stream(spark, "localhost:9092", "t")


def test_invalid_max_offsets_rejected(spark):
    with pytest.raises(ValueError, match="must be positive"):
        kafka_value_stream(spark, "localhost:9092", "t", max_offsets_per_trigger=0)


@pytest.mark.skipif(
    not BOOTSTRAP, reason="set SPARK_GRAFT_KAFKA_BOOTSTRAP to run against a broker"
)
def test_kafka_value_contract_live(spark, tmp_path):
    """Against a real broker: the source yields DataFrame[value: string]
    and drains through the same driver the file stand-in exercises."""
    stream = kafka_value_stream(spark, BOOTSTRAP, "spark_graft_smoke")
    assert [f.name for f in stream.schema.fields] == ["value"]
    assert stream.schema.fields[0].dataType.simpleString() == "string"
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_smoke")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
