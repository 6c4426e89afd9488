"""Capture ``explain("formatted")`` output for named registry entries.

Optimization-round evidence tool (guide §1/§7.2): writes one text file per
entry to the given output directory — ``<out_dir>/<name>_<tag>.txt`` — so
plan claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are
diffable and committable. Plan BUILD only for most entries (no jobs), but
entries that materialize fixtures at plan time (the MOR sink family,
schema-drift inference, cached indexes) do run their build jobs.

Usage:
    python scripts/capture_plans.py OUT_DIR TAG [entry1,entry2,...]

Default entry set: the bench headline queries + the driver-facing REGISTRY.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY, REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        names = [n.strip() for n in sys.argv[3].split(",") if n.strip()]
    else:
        from bench import BENCH_QUERIES

        names = list(dict.fromkeys([*BENCH_QUERIES, *REGISTRY]))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_err = 0
    for name in names:
        fn = FULL_REGISTRY[name][0]
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            text = formatted_plan(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — capture must finish
            text = f"ERROR building plan: {exc}"
            n_err += 1
        with open(path, "w") as f:
            f.write(text)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()
    sys.exit(1 if n_err else 0)


if __name__ == "__main__":
    main()
