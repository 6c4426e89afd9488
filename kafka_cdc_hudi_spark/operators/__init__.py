from kafka_cdc_hudi_spark.operators.cdc import (
    debezium_envelope_schema,
    dms_envelope_schema,
    infer_json_schema,
    parse_debezium,
    parse_dms,
    parse_stream,
    raw_route_prefilter,
    route,
)
from kafka_cdc_hudi_spark.operators.dedup import latest_per_key, latest_per_key_agg
from kafka_cdc_hudi_spark.operators.merge import align_by_name, merge_upsert

__all__ = [
    "debezium_envelope_schema",
    "dms_envelope_schema",
    "infer_json_schema",
    "parse_debezium",
    "parse_dms",
    "parse_stream",
    "raw_route_prefilter",
    "route",
    "latest_per_key",
    "latest_per_key_agg",
    "align_by_name",
    "merge_upsert",
]
