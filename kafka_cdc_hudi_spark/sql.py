"""SQL frontend over synced tables (reference O12 parity).

The reference registers each in-flight batch as a GLOBAL temp view so its
SQL-string dedup can see it (/root/reference/glue/cdc_hudi.py:208-209); our
engine needs no views internally (pure DataFrame ops, SURVEY §4.3.5). What
users actually need is the reference's *outcome*: the synced tables being
queryable with SQL — downstream of the reference that is Hudi tables in the
Glue catalog. ``register_table_views`` provides that: session-local temp
views (no shared global namespace, no cross-thread races) named
``<db>_<table>`` over the merged state.

Views are SNAPSHOT-pinned: registration resolves the sink's version pointer,
so queries see a consistent table version regardless of concurrent merges
(the sink keeps ``keep_versions`` snapshots, so a pinned view stays readable
for that horizon). Re-register to observe newer merges.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver


def view_name(db: str, table: str, prefix: str = "") -> str:
    base = f"{db}_{table}".replace(".", "_").replace("-", "_")
    return f"{prefix}{base}"


def register_table_views(
    spark: SparkSession, driver: CdcStreamDriver, prefix: str = ""
) -> list[str]:
    """Expose every synced table's current merged state as a temp view;
    returns the registered view names (tables with no committed state yet
    are skipped)."""
    names = []
    seen: dict[str, str] = {}
    for spec in driver.config.tables:
        name = view_name(spec.db, spec.table, prefix)
        # '.'/'-' collapse to '_', so distinct tables CAN map to one view
        # name — refuse rather than silently overwrite the first view
        if name in seen:
            raise ValueError(
                f"view name collision: {seen[name]} and {spec.qualified_name} "
                f"both map to temp view {name!r}; use distinct prefixes"
            )
        seen[name] = spec.qualified_name
        state = driver.sink_for(spec).read(spark)
        if state is None:
            continue
        state.createOrReplaceTempView(name)
        names.append(name)
    return names
