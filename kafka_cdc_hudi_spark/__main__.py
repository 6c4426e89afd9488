"""Job launcher — the reference's operational surface as a CLI.

The reference runs as a managed Spark job that loads a java-properties
config and starts the streaming sync (/root/reference/glue/cdc_hudi.py:41-93,
/root/reference/README.md "glue job conf"). This module is the standalone
equivalent:

    python -m kafka_cdc_hudi_spark --properties job.properties
    python -m kafka_cdc_hudi_spark --properties job.properties \
        --source-dir /data/cdc_json --drain

With ``kafka_broker``/``topic`` in the properties the job consumes Kafka
(reference O1-O3); ``--source-dir`` swaps in the JSON-lines file stream
(the broker-free stand-in with the identical ``DataFrame[value]``
contract). ``--drain`` processes everything available and exits — the
batch-backfill mode; the default runs until interrupted, like the
reference job.
"""

from __future__ import annotations

import argparse
import sys

from kafka_cdc_hudi_spark.config import JobConfig
from kafka_cdc_hudi_spark.session import get_spark
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream, kafka_value_stream
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver


def build_stream(spark, cfg: JobConfig, source_dir: str | None):
    if source_dir:
        return json_file_value_stream(spark, source_dir)
    if not (cfg.kafka_bootstrap_servers and cfg.topic):
        raise SystemExit(
            "no source: set kafka_broker + topic in the properties file "
            "or pass --source-dir"
        )
    return kafka_value_stream(
        spark,
        cfg.kafka_bootstrap_servers,
        cfg.topic,
        starting_offsets=cfg.starting_offsets,
        starting_timestamp=cfg.starting_timestamp,
        max_offsets_per_trigger=cfg.max_offsets_per_trigger,
        consumer_group=cfg.consumer_group,
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m kafka_cdc_hudi_spark")
    p.add_argument("--properties", required=True, help="java-properties job config")
    p.add_argument(
        "--source-dir",
        help="read CDC envelopes from JSON-lines files in this dir instead of Kafka",
    )
    p.add_argument(
        "--drain",
        action="store_true",
        help="process all available input then exit (batch backfill)",
    )
    p.add_argument("--master", default=None, help="override Spark master URL")
    args = p.parse_args(argv)

    with open(args.properties) as f:
        cfg = JobConfig.from_properties_text(f.read())
    if not cfg.tables:
        raise SystemExit("sync_table_list is empty — nothing to sync")

    spark = get_spark(master=args.master)
    driver = CdcStreamDriver(spark, cfg)
    query = driver.start(build_stream(spark, cfg, args.source_dir))
    if args.drain:
        query.processAllAvailable()
        query.stop()
    else:  # run like the reference job: until the platform stops it
        query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
