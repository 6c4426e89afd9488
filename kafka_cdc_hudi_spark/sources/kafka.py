"""Streaming sources.

``kafka_value_stream`` mirrors reference O1-O3
(/root/reference/glue/cdc_hudi.py:82-95): Kafka subscribe, rate limiting via
``maxOffsetsPerTrigger``, offset positioning by offsets or timestamp, then
``CAST(value AS STRING)`` projection. There is no Kafka broker in the test
environment, so tests drive the same downstream pipeline through a file
source (``json_file_value_stream``) — the contract is just
``DataFrame[value: string]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_value_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    starting_timestamp: str | None = None,
    max_offsets_per_trigger: int | None = 1_000_000,
    consumer_group: str | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka -> DataFrame[value: string] (reference O1-O3)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError(
                f"max_offsets_per_trigger must be positive, got {max_offsets_per_trigger}"
            )
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    # offset positioning (/root/reference/glue/cdc_hudi.py:89-92)
    if starting_timestamp:
        r = r.option("startingTimestamp", starting_timestamp)
    else:
        r = r.option("startingOffsets", starting_offsets)
    if consumer_group:
        # reference passes a commit group id for lag monitoring
        # (/root/reference/glue/cdc_hudi.py:88)
        r = r.option("kafka.consumer.commit.groupid", consumer_group)
    for k, v in (extra_options or {}).items():
        r = r.option(k, v)
    try:
        stream = r.load()
    except Exception as exc:  # connector jar missing (pip pyspark ships without it)
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
            raise RuntimeError(
                "the Kafka connector is not on the classpath; start Spark with "
                '.config("spark.jars.packages", '
                '"org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>") '
                "or use json_file_value_stream for a broker-free stand-in"
            ) from exc
        raise  # real config errors (bad options etc.) pass through untouched
    return stream.selectExpr("CAST(value AS STRING) AS value")


def json_file_value_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Text-file stream of raw JSON lines -> DataFrame[value: string].

    Broker-free stand-in for Kafka in tests (FIXTURES §A): each line is one
    CDC envelope, exactly the post-cast shape of O3.
    """
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
        .selectExpr("CAST(value AS STRING) AS value")
    )
