"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing = full query execution to a count/collect action (result
materialization), cold plans on a warm JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_hudi_spark.plans.catalog import REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402

#: headline set — the queries that exercise every engine subsystem
BENCH_QUERIES = [
    "cdc_parse_debezium",
    "cdc_latest_per_key",
    "cdc_merge_two_batches",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "events_hourly_agg",
    "topk_orders_per_customer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first timed query isn't charged for session
    # startup; plans themselves still run cold.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in REGISTRY]

    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
