from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable

__all__ = ["KeyedParquetTable"]
