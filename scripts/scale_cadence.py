"""Scale-cadence harness: warm-wall ratios for registry entries across
scale-factor directories (generalizes the ad-hoc runs behind
SCALE_SF10_r11.json into committed tooling).

For each entry x sf_dir: one cold execution (rows recorded from it), then
WARM_RUNS warm executions; the reported number is the MIN of the warm runs
(the sweep.py r11 tier — bounds scheduler/GC tail that single warm runs
bounce on). Ratios between consecutive dirs are computed on the warm-min.
The whole run is calib-gated (scripts/calib_gate.py) so a hot-box artifact
self-identifies.

Usage:
    python scripts/scale_cadence.py OUT.json entry1,entry2 DIR_A DIR_B [...]

An entry that fails on a dir (e.g. a table absent from upsampled scale
data) is recorded with its error and excluded from ratios — partial
evidence beats a crashed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# calib_gate lives next to this script; the repo-root insert above doesn't
# cover `python -m scripts.foo`-style invocation (ADVICE r10)
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from calib_gate import end_calib, gated_calib  # noqa: E402

WARM_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_WARM_RUNS", "3"))

#: warm-run action. "topandas" (default) times execution + full driver
#: transfer — right for entries a consumer collects. "noop" times a
#: `.write.format("noop")` sink: complete execution of the plan with zero
#: driver transfer — the engine-side number for entries whose OUTPUT
#: grows with scale (a 2.5M-row toPandas otherwise dominates the ratio
#: and reads as compute growth when it's transfer).
WARM_ACTION = os.environ.get("SPARK_GRAFT_SCALE_ACTION", "topandas")


def _warm_once(fn, spark, d) -> float:
    t1 = time.perf_counter()
    df = fn(spark, d)
    if WARM_ACTION == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.toPandas()
    return round(time.perf_counter() - t1, 3)


def main() -> None:
    if len(sys.argv) < 5:
        sys.exit(__doc__)
    out_path, names, dirs = sys.argv[1], sys.argv[2].split(","), sys.argv[3:]
    unknown = [n for n in names if n not in FULL_REGISTRY]
    if unknown:
        sys.exit(f"unknown entries: {unknown}")

    spark = get_spark(app_name="scale_cadence")
    spark.sparkContext.setLogLevel("ERROR")
    stamp = gated_calib(spark)

    entries: dict[str, dict] = {}
    for name in names:
        fn = FULL_REGISTRY[name][0]
        per_dir: dict[str, dict] = {}
        for d in dirs:
            label = os.path.basename(os.path.normpath(d))
            # cold and warm runs fail independently (ADVICE r11): a warm
            # throw (e.g. transient OOM) keeps the already-measured
            # cold/rows data and any completed warm runs, with the error
            # attached alongside instead of replacing the record
            rec: dict = {}
            try:
                t0 = time.perf_counter()
                rows = len(fn(spark, d).toPandas())
                rec["rows"] = rows
                rec["cold_sec"] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — record and continue
                rec["error"] = f"{exc}"[:300]
                per_dir[label] = rec
                print(f"# {name} @ {label}: FAILED cold: {exc}", file=sys.stderr)
                continue
            warms: list[float] = []
            try:
                for _ in range(WARM_RUNS):
                    warms.append(_warm_once(fn, spark, d))
            except Exception as exc:  # noqa: BLE001 — keep partial warms
                rec["warm_error"] = f"{exc}"[:300]
                print(f"# {name} @ {label}: warm FAILED: {exc}", file=sys.stderr)
            if warms:
                rec["warm_secs"] = warms
                # a degraded warm set (fewer than WARM_RUNS samples) keeps
                # its raw timings but earns no warm_min_sec, so the
                # min-of-N tier claim holds and ratios never mix tiers
                if len(warms) == WARM_RUNS:
                    rec["warm_min_sec"] = min(warms)
            per_dir[label] = rec
            print(
                f"# {name} @ {label}: rows={rec['rows']} cold={rec['cold_sec']}s "
                f"warm={warms}"
            )
        ratios = {}
        labels = [os.path.basename(os.path.normpath(d)) for d in dirs]
        for a, b in zip(labels, labels[1:]):
            if "warm_min_sec" in per_dir.get(a, {}) and "warm_min_sec" in per_dir.get(b, {}):
                ratios[f"{a}->{b}"] = round(
                    per_dir[b]["warm_min_sec"] / max(per_dir[a]["warm_min_sec"], 1e-9), 2
                )
        entries[name] = {"dirs": per_dir, "warm_ratios": ratios}

    stamp = end_calib(spark, stamp)
    out = {
        "what": "warm-min-of-%d wall ratios across scale dirs (scripts/scale_cadence.py)" % WARM_RUNS,
        "timing_tier": "min of warm executions; cold kept",
        "warm_action": WARM_ACTION,
        # the cold run always collects via toPandas (rows come from it), so
        # under warm_action=noop the cold number includes driver transfer
        # while warm numbers do not — don't compare the two tiers (ADVICE r11)
        "cold_action": "topandas",
        "dirs": dirs,
        "entries": entries,
        **stamp,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
