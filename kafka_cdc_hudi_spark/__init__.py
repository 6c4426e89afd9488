"""kafka_cdc_hudi_spark — a PySpark-native CDC ingest + analytics engine.

A from-scratch re-expression of the capabilities of the reference system
(yhyyz/kafka-cdc-hudi: Kafka CDC JSON -> per-table routing -> in-batch
latest-per-key dedup -> keyed upsert into queryable tables), built
Spark-first:

- declarative envelope parsing with ``from_json`` + declared ``StructType``
  (reference infers schema per table per batch: /root/reference/glue/cdc_hudi.py:234)
- native column expressions everywhere (reference uses two row-at-a-time
  Python UDFs: /root/reference/glue/cdc_hudi.py:115-140,165-177)
- a pure-Spark keyed merge with Hudi ``DefaultHoodieRecordPayload``
  precombine semantics (/root/reference/glue/cdc_hudi.py:189,195) — no Hudi
  jar required
- Structured Streaming ``foreachBatch`` driver with per-table fan-out
  (/root/reference/glue/cdc_hudi.py:254-287)

Plus a large-scale training-data toolkit (dedup, similarity search, text
analysis, multimodal plumbing) that the reference does not have but a 100 TB
pipeline needs.
"""

__version__ = "0.1.0"
