"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing tier (r11+, VERDICT r10 item 1): each query runs THREE times;
``value`` and ``queries`` report the MIN of the two warm executions (the
round-over-round comparable number — first-run cold-JIT spikes of 3-13x
land on different queries per run and made the per-query diff unusable
below ~2x, and even single warm runs of sub-2s queries bounce up to 3x
between in-band runs on identical code), and the cold first run is kept
as ``value_cold`` / ``queries_cold``. r1-r10 artifacts timed only the
cold first execution. Timing = full query execution to a count action
(result materialization).

Contamination flag (r14 tier, VERDICT r13 item 2): ``contaminated`` is
the OR of FIVE gates — the retry-exhausted CPU calib before, the CPU
calib after, the raw pre-session 1-min loadavg refusal, and a
reference-query probe (warm min-of-2 q1 at sf0.001) at both ends. The
loadavg and ref-query gates close the two certified-clean-but-hot
failures on record: BENCH_r10 (after-calib out of band, self-labeled
clean) and BENCH_r13 (every query ~39% slow at loadavg 3.4 with both
CPU probes in band). See AMBIENT.md for per-artifact-class bands.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY as REGISTRY  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402

#: headline set — the queries that exercise every engine subsystem
BENCH_QUERIES = [
    "cdc_parse_debezium",
    "cdc_latest_per_key",
    "cdc_merge_two_batches",
    "cdc_merge_mor",
    # cdc_merge_bucketed is measured separately (PLANS.md "bucketed COW"):
    # its headline cost is dominated by the same fixture generation as the
    # MOR row, double-counting ~4s without adding signal round-over-round.
    # Run it ad hoc via SPARK_GRAFT_BENCH_QUERIES=cdc_merge_bucketed.
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "events_hourly_agg",
    "topk_orders_per_customer",
    "asof_join_last_click",
    "events_session_windows",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
]


def _calibrate(spark) -> float:
    """Fixed-work CPU probe (VERDICT r6 item 2): a constant
    spark.range sum whose wall time varies only with host load (compare
    round-over-round; ~0.3-0.4s warm-JVM on an idle box). A contaminated
    driver run (ambient neighbor load, PLANS.md "bench variance")
    inflates it by the same factor as the query timings — so a slow
    BENCH artifact with a slow calib_sec is environmental, not a code
    regression."""
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
    return round(time.perf_counter() - t0, 3)


#: warm-JVM probe reading on an idle box at local[32] is ~0.3-0.4s; above
#: this the run is ambient-contaminated and timings understate the engine
_CALIB_BAND_S = float(os.environ.get("SPARK_GRAFT_CALIB_BAND", "0.45"))
_CALIB_RETRIES = int(os.environ.get("SPARK_GRAFT_CALIB_RETRIES", "5"))
_CALIB_RETRY_SLEEP_S = 20.0


def _calibrate_gated(spark) -> tuple[float, bool, int]:
    """VERDICT r8 item 3: the probe must REFUSE contamination, not just
    stamp it — retry until the reading is in band, and only after
    ``_CALIB_RETRIES`` exhausted proceed with an explicit
    ``contaminated`` flag in the artifact (the driver needs an artifact
    either way; a silent 19%-slow number is the failure mode this kills).
    Returns (last_calib, contaminated, retries_used)."""
    for attempt in range(_CALIB_RETRIES):
        c = _calibrate(spark)
        if c <= _CALIB_BAND_S:
            return c, False, attempt
        print(
            f"# calib {c}s > {_CALIB_BAND_S}s band (attempt {attempt + 1}/"
            f"{_CALIB_RETRIES}, loadavg {os.getloadavg()[0]:.2f}) — waiting "
            f"{_CALIB_RETRY_SLEEP_S:.0f}s for ambient load to clear",
            file=sys.stderr,
        )
        time.sleep(_CALIB_RETRY_SLEEP_S)
    c = _calibrate(spark)
    return c, c > _CALIB_BAND_S, _CALIB_RETRIES


#: warm min-of-2 q1_pricing_summary at sf0.001 reads 0.25-0.47s across
#: every clean-stamped r14 run on an idle box at local[32]; this probe
#: exercises the parquet scan + shuffle + agg path, so it catches I/O-
#: and memory-bandwidth-shaped ambient load the pure-CPU calib kernel
#: misses (the BENCH_r13 gap: calib in band while every query ran ~39%
#: slow under loadavg 3.4). Band tightened 0.9 -> 0.7 in the r14 opt
#: round: an Aug-18 epoch ran every query ~5x slow (warm total 42.9s)
#: with the CPU calib in band and ref probes 0.727/0.888 — just under
#: the old band — so a run like that certified clean. 0.7 = max
#: observed-idle 0.47 + ~50% margin, and catches that epoch on both legs.
_REF_PROBE_QUERY = "q1_pricing_summary"
_REF_PROBE_BAND_S = float(os.environ.get("SPARK_GRAFT_REF_BAND", "0.7"))
_REF_PROBE_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def _ref_probe(spark) -> float:
    """Min-of-2 warm reference-query probe (see _REF_PROBE_QUERY note).
    Mirrors the warmup block's missing-dir fallback: without the probe
    dir the bench must still emit its artifact (reads 0.0 = gate passes
    on that leg, with a stderr note)."""
    if not (_REF_PROBE_DIR and os.path.isdir(_REF_PROBE_DIR)):
        print(f"# ref probe skipped: no dir {_REF_PROBE_DIR!r}", file=sys.stderr)
        return 0.0
    fn = REGISTRY[_REF_PROBE_QUERY][0]
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, _REF_PROBE_DIR).count()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def _certify(
    contaminated_before: bool,
    calib_after: float,
    loadavg_stamp: dict,
    ref_before: float,
    ref_after: float,
) -> bool:
    """True = the artifact is ambient-contaminated. ORs every gate:
    CPU-probe before (retry-exhausted) and after, the raw pre-session
    loadavg refusal, and the reference-query probe at both ends — so a
    run like BENCH_r13 (CPU probe in band, loadavg 3.4, queries ~39%
    slow) cannot stamp itself clean (pinned in tests/test_calib_gate.py)."""
    return bool(
        contaminated_before
        or calib_after > _CALIB_BAND_S
        or loadavg_stamp["loadavg_contaminated"]
        or ref_before > _REF_PROBE_BAND_S
        or ref_after > _REF_PROBE_BAND_S
    )


def _loadavg_gate() -> dict:
    """Pre-session ambient refusal on the raw 1-min loadavg (VERDICT r13
    item 2). Must run BEFORE get_spark() — afterwards the session's own
    warmup pollutes the reading. Shared logic in scripts/calib_gate.py."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from calib_gate import loadavg_gate

    return loadavg_gate()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    loadavg_stamp = _loadavg_gate()  # before the session exists
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    loadavg_start = list(os.getloadavg())

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in REGISTRY]

    # JVM/JIT warmup: run each headline query once at the smallest SF so
    # codegen'd classes, JSON codecs, parquet readers, and shuffle machinery
    # are compiled before timing. Plans for the target SF are still built
    # and executed cold — this removes one-time JVM init from the first
    # timed query, not per-query work.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if warm_dir and os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            try:
                REGISTRY[name][0](spark, warm_dir).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    else:
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    calib_before, contaminated_before, retries = _calibrate_gated(spark)
    ref_before = _ref_probe(spark)
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize
        timings_cold[name] = round(time.perf_counter() - t0, 3)
        # min of two warm executions = the reported tier (see module
        # docstring); single warm runs of sub-2s queries still bounce up
        # to 3x between in-band runs on identical code (SWEEP r11 run1
        # vs run2) — min-of-two bounds that scheduler/GC tail
        warms = []
        for _ in range(2):
            t1 = time.perf_counter()
            fn(spark, sf_dir).count()
            warms.append(round(time.perf_counter() - t1, 3))
        timings[name] = min(warms)
        print(
            f"# {name}: warm {timings[name]}s / cold {timings_cold[name]}s"
            f" ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    total_cold = round(sum(timings_cold.values()), 3)
    calib_after = _calibrate(spark)
    ref_after = _ref_probe(spark)
    contaminated = _certify(
        contaminated_before, calib_after, loadavg_stamp, ref_before, ref_after
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # warm-second-execution tier (r11+; r1-r10 values are the
                # cold tier — compare across tiers via value_cold)
                "value": total,
                "value_cold": total_cold,
                "unit": "sec",
                "queries": timings,
                "queries_cold": timings_cold,
                "timing_tier": (
                    "warm-min-of-2 (r11+; r1-r10 artifacts timed the "
                    "cold first run)"
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-load self-identification (VERDICT r6 item 2): an
                # idle box reads calib ~0.3-0.6s and loadavg « nproc;
                # uniform query inflation + inflated calib = contaminated
                # run, not a regression
                "calib_sec_before": calib_before,
                "calib_sec_after": calib_after,
                "calib_band_sec": _CALIB_BAND_S,
                "calib_retries": retries,
                # reference-query probe (r14+, VERDICT r13 item 2): warm
                # min-of-2 of q1 at sf0.001 before AND after the timed
                # region; catches I/O/membw-shaped load the CPU kernel
                # misses
                "ref_probe_before_sec": ref_before,
                "ref_probe_after_sec": ref_after,
                "ref_probe_band_sec": _REF_PROBE_BAND_S,
                # raw pre-session loadavg refusal gate (r14+): the r13
                # artifact certified clean at loadavg 3.4
                **loadavg_stamp,
                # True when the before-gate exhausted its retries out of
                # band OR the after-run probe reads out of band (load can
                # arrive mid-run — a single pre-probe races it; VERDICT
                # r10 item 1). Either way the numbers understate the
                # engine and MUST NOT be read as a regression.
                "contaminated": contaminated,
                "loadavg_start": loadavg_start,
                "loadavg_end": list(os.getloadavg()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
