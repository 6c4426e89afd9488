"""Mechanized physical-plan audit over EVERY registry entry.

Extracts the plan features PLANS.md tracks by hand — exchange count,
join strategies, Python evaluation stages, pushdown, rank-limit pushdown,
cartesian products — from each entry's executed plan at sf0.001 (plan
BUILD only; no jobs run) and writes a committed JSON artifact
(PLAN_AUDIT_r{N}.json). Diffable round-over-round: a new Exchange or a
broadcast that silently became a sort-merge join shows up as a one-line
diff instead of a bench regression three rounds later.

Usage: python scripts/plan_audit.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_FEATURES = {
    "exchanges": r"\bExchange\b",
    "broadcast_joins": r"\bBroadcastHashJoin\b",
    "sortmerge_joins": r"\bSortMergeJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "python_eval": r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b",
    "window_group_limit": r"\bWindowGroupLimit\b",
    "file_scans": r"\bFileScan\b",
    "pushed_filter_scans": r"PushedFilters: \[[^\]]",
    "partition_filter_scans": r"PartitionFilters: \[[^\]]",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    entries: dict[str, dict] = {}
    n_err = 0
    for name, (fn, _sql) in FULL_REGISTRY.items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            entries[name] = {
                k: len(re.findall(pat, plan)) for k, pat in _FEATURES.items()
            }
        except Exception as exc:  # noqa: BLE001 — audit must finish
            entries[name] = {"error": str(exc)[:200]}
            n_err += 1
        print(f"# {name}: {entries[name]}", file=sys.stderr)
    result = {
        "sf_dir": SF_DIR,
        "n_entries": len(entries),
        "n_errors": n_err,
        "totals": {
            k: sum(e.get(k, 0) for e in entries.values() if "error" not in e)
            for k in _FEATURES
        },
        "entries": entries,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()
    sys.exit(1 if n_err else 0)


if __name__ == "__main__":
    main()
