"""Unified query registry: name -> (spark_fn, oracle_sql | None).

Consumed by __spark_entry__.py (driver contract) and bench.py.
"""

from __future__ import annotations

from kafka_cdc_hudi_spark.plans.catalog_analytics import ANALYTICS_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_cdc import CDC_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_streaming import STREAMING_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_text import TEXT_QUERIES

REGISTRY: dict[str, tuple] = {}
REGISTRY.update(CDC_QUERIES)
REGISTRY.update(ANALYTICS_QUERIES)
REGISTRY.update(TEXT_QUERIES)
REGISTRY.update(STREAMING_QUERIES)


def register(name: str, fn, oracle_sql: str | None) -> None:
    REGISTRY[name] = (fn, oracle_sql)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
