"""Shared ambient-load calibration gate (VERDICT r9 item 5).

bench.py and sweep.py already refuse/stamp ambient contamination; the soak
scripts (soak_ann / soak_churn / soak_scd2) shipped r9 artifacts captured
at loadavg 15 — numbers nobody can trust. This module centralizes the
probe so every timed artifact carries the same evidence:

- ``calibrate(spark)``: fixed-work CPU probe (constant sum over
  spark.range) — wall time varies only with host load, so contaminated
  runs are self-identifying.
- ``gated_calib(spark)``: cold probe for JVM-warmup continuity, then a
  warm probe retried until it lands inside the idle band (default 0.45s
  at local[32], same band bench.py uses). If retries exhaust, the run
  proceeds with an explicit ``contaminated`` stamp — artifacts are needed
  either way, but a hot-box number must say so.
- ``end_calib(spark, stamp)``: one more warm probe AFTER the timed
  region. A single pre-probe RACES load arriving mid-measurement
  (reproduced under a 24-core burn in tests/test_dedup_skew.py); the
  artifact is only trustworthy when both ends are in band, so
  ``contaminated`` is the OR of the two.
"""

from __future__ import annotations

import os
import sys
import time


def calibrate(spark) -> float:
    """Fixed-work CPU probe; see module docstring."""
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
    return round(time.perf_counter() - t0, 3)


def loadavg_gate(
    max_load: float | None = None,
    retries: int | None = None,
    sleep_s: float = 20.0,
) -> dict:
    """Ambient-load refusal on the 1-minute loadavg ITSELF (VERDICT r13
    item 2): the committed BENCH_r13 certified ``contaminated: false``
    while loadavg was 3.4 at start and every query ran ~39% slow — the
    CPU calib kernel missed load that was bursty or memory-bandwidth
    shaped. Call BEFORE heavy work: bench.py runs it pre-session;
    ``gated_calib`` callers run it right after session creation, where
    the JVM's startup contributes negligibly to the 1-min loadavg
    (observed <= 0.2 on the r14 soak captures) — the reading is
    dominated by ambient/previous-job load either way. A decaying tail
    from a FINISHED job also trips it (can't be locally distinguished
    from live load); refusal errs strict per AMBIENT.md, so give
    sequential captures ~3 min of settle time. Retry-sleeps until the
    1-min loadavg drops under the threshold; on exhaustion proceeds
    with an explicit contaminated stamp. Returns the stamp fields
    (loadavg_gate_*); callers OR ``loadavg_contaminated`` into their
    artifact's ``contaminated``."""
    if max_load is None:
        max_load = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "2.0"))
    if retries is None:
        retries = int(os.environ.get("SPARK_GRAFT_CALIB_RETRIES", "5"))
    used = 0
    load = os.getloadavg()[0]
    while load > max_load and used < retries:
        used += 1
        print(
            f"# loadavg {load:.2f} > {max_load} gate (retry {used}/{retries})"
            f" — waiting {sleep_s:.0f}s for ambient load to clear",
            file=sys.stderr,
        )
        time.sleep(sleep_s)
        load = os.getloadavg()[0]
    return {
        "loadavg_gate_max": max_load,
        "loadavg_gate_retries": used,
        "loadavg_gate_reading": round(load, 3),
        "loadavg_contaminated": load > max_load,
    }


def gated_calib(
    spark,
    band: float | None = None,
    retries: int | None = None,
    sleep_s: float = 20.0,
) -> dict:
    """Run the retry-gated warm probe; returns the stamp fields every
    timed artifact embeds (calib_sec / calib_warm_sec / calib_band_sec /
    calib_retries / contaminated / loadavg_start)."""
    if band is None:
        band = float(os.environ.get("SPARK_GRAFT_CALIB_BAND", "0.45"))
    if retries is None:
        retries = int(os.environ.get("SPARK_GRAFT_CALIB_RETRIES", "5"))
    load0 = list(os.getloadavg())
    lg = loadavg_gate(sleep_s=sleep_s)  # refuse on raw loadavg first (r13 gap)
    cold = calibrate(spark)  # cold-JVM reading (~3.3-3.8s healthy at local[32])
    warm = calibrate(spark)
    used = 0
    while warm > band and used < retries:
        used += 1
        print(
            f"# warm calib {warm}s > {band}s band (retry {used}/{retries}, "
            f"loadavg {os.getloadavg()[0]:.2f})",
            file=sys.stderr,
        )
        time.sleep(sleep_s)
        warm = calibrate(spark)
    return {
        "calib_sec": cold,
        "calib_warm_sec": warm,
        "calib_band_sec": band,
        "calib_retries": used,
        "contaminated": bool(warm > band or lg["loadavg_contaminated"]),
        "loadavg_start": load0,
        **lg,
    }


def end_calib(spark, stamp: dict) -> dict:
    """Post-measurement probe: updates ``stamp`` in place with
    calib_end_sec / loadavg_end and ORs contamination from either end."""
    end = calibrate(spark)
    stamp["calib_end_sec"] = end
    stamp["loadavg_end"] = list(os.getloadavg())
    stamp["contaminated"] = bool(stamp["contaminated"] or end > stamp["calib_band_sec"])
    return stamp
