"""Isolated query timing via the noop sink (optimization guide §1.4).

Unlike bench.py (whose ``count()`` action lets the optimizer prune columns
— the round-over-round comparable tier), the noop write materializes EVERY
column of every row, so this measures the full computation including
projections that ``count()`` would skip. Use it to isolate where a query's
time goes while optimizing; bench.py stays the official artifact.

Prints one JSON line: {"queries": {name: {"cold": s, "warm": s}}, ...}.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python scripts/noop_time.py entry1,entry2 [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="noop_time")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in names:
        fn = FULL_REGISTRY[name][0]
        if warm_dir and os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                spark.sparkContext.setJobDescription(f"warmup:{name}")
                noop(fn(spark, warm_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.perf_counter()
        noop(fn(spark, sf_dir))
        cold = round(time.perf_counter() - t0, 3)
        warms = []
        for i in range(n_warm):
            spark.sparkContext.setJobDescription(f"warm{i}:{name}")
            t1 = time.perf_counter()
            noop(fn(spark, sf_dir))
            warms.append(round(time.perf_counter() - t1, 3))
        out[name] = {"cold": cold, "warm": min(warms), "warm_all": warms}
        print(f"# {name}: cold {cold}s warm {min(warms)}s {warms}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "tier": "noop-sink", "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
