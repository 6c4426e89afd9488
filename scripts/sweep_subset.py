"""Isolated sweep-tier re-timing of named entries (same methodology as
scripts/sweep.py: cold toPandas + min-of-N warm toPandas at
$SPARK_GRAFT_SF_DIR) — for checking whether a full-sweep reading was
weather or engine without paying for the other 170 entries.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
    python scripts/sweep_subset.py entry1,entry2 [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="sweep_subset")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in names:
        fn = FULL_REGISTRY[name][0]
        spark.sparkContext.setJobDescription(f"subset:{name}")
        t0 = time.perf_counter()
        rows = len(fn(spark, sf_dir).toPandas())
        cold = round(time.perf_counter() - t0, 3)
        warms = []
        for _ in range(n_warm):
            t1 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            warms.append(round(time.perf_counter() - t1, 3))
        out[name] = {"rows": rows, "cold_sec": cold, "spark_sec": min(warms), "warm_all": warms}
        print(f"# {name}: cold {cold} warm {warms}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
