from kafka_cdc_hudi_spark.sources.kafka import kafka_value_stream
from kafka_cdc_hudi_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["kafka_value_stream", "TABLE_NAMES", "load_table", "load_tables"]
