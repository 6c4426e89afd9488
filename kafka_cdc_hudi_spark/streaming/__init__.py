from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver

__all__ = ["CdcStreamDriver"]
