"""Schema drift UNDER SCALE (VERDICT r12 item 4): 10M Debezium events
through the full driver with a producer shape change mid-stream.

The drift probe (`streaming/driver.py::_drifted`) and union-by-name schema
merge were only ever exercised at unit/streaming-test scale; every 10M
soak ran a drift-free envelope. This soak feeds 5 time-ordered ~2M-event
batches where, at the batch-3 boundary, the payload ADDS a `score` column
and DROPS `props` — the driver must (a) detect the new key with the
bounded probe, (b) re-infer + merge schemas exactly once, (c) null-fill
`props` for post-drift rows and `score` for pre-drift rows, and (d) stay
oracle-exact on the FINAL state including both drifted columns.

Artifact: per-batch wall split (the drift batch absorbs the one-time
re-inference), final-state oracle verdict over (user_id, event_id, score,
props-null), calib-stamped.

Usage: python scripts/soak_drift.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec  # noqa: E402
from kafka_cdc_hudi_spark.plans.cdc_fixtures import (  # noqa: E402
    drift_segmented_debezium_envelopes,
)
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver  # noqa: E402
from calib_gate import end_calib, gated_calib  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata/sf10"))
N_BATCHES = 5
#: drift lands exactly at the batch-3 boundary: batches are equal-count
#: time slices, so the cut is the 2/5 timestamp quantile
DRIFT_BATCH = 2  # 0-based index of the first drifted batch


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    stamp = gated_calib(spark)
    print(f"# calib: {stamp}", file=sys.stderr)

    events = load_table(spark, SF, "events")
    # equal-count time slices -> batch boundaries at ts quantiles
    epochs = events.selectExpr("unix_micros(ts) AS e")
    cuts = epochs.stat.approxQuantile("e", [i / N_BATCHES for i in range(1, N_BATCHES)], 0.0001)
    cuts_sql = [int(c) for c in cuts]
    ts_cut_micros = cuts_sql[DRIFT_BATCH - 1]  # boundary entering batch DRIFT_BATCH

    import datetime

    # fromtimestamp(tz=utc) — utcfromtimestamp is deprecated since 3.12
    ts_cut = datetime.datetime.fromtimestamp(
        ts_cut_micros / 1e6, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    print(f"# drift cut at {ts_cut} (batch {DRIFT_BATCH})", file=sys.stderr)

    env = drift_segmented_debezium_envelopes(events, ts_cut)
    n_events = env.count()

    # stage the N time-ordered batch files
    stage = tempfile.mkdtemp(prefix="drift_stage_")
    bounds = [None, *cuts_sql, None]
    from pyspark.sql import functions as F

    seg_files = []
    for i in range(N_BATCHES):
        seg = env
        if bounds[i] is not None:
            seg = seg.filter(F.unix_micros("ts") >= bounds[i])
        if bounds[i + 1] is not None:
            seg = seg.filter(F.unix_micros("ts") < bounds[i + 1])
        d = os.path.join(stage, f"seg{i}")
        seg.select("value").repartition(1).write.mode("overwrite").text(d)
        part = [n for n in os.listdir(d) if n.startswith("part-")][0]
        seg_files.append(os.path.join(d, part))

    work = tempfile.mkdtemp(prefix="soak_drift_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    spec = TableSpec(db="test_db", table="events", primary_keys=("user_id",))
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[spec],
        sink_root=os.path.join(work, "sink"),
        checkpoint_location=os.path.join(work, "ckpt"),
        sink_mode="mor",
        trigger_interval="0 seconds",
        max_workers=2,
    )
    driver = CdcStreamDriver(spark, cfg)
    q = driver.start(json_file_value_stream(spark, src, max_files_per_trigger=1))
    batch_walls = []
    t_all = time.perf_counter()
    for i, f in enumerate(seg_files):
        shutil.move(f, os.path.join(src, f"b{i}.txt"))
        t0 = time.perf_counter()
        q.processAllAvailable()
        batch_walls.append(round(time.perf_counter() - t0, 2))
        print(f"# batch {i}: {batch_walls[-1]} s", file=sys.stderr)
    wall = time.perf_counter() - t_all
    q.stop()

    state = driver.sink_for(spec).read(spark)
    cols = state.columns
    assert "score" in cols and "props" in cols, f"merged schema missing drift columns: {cols}"
    got = {
        (r["user_id"], r["event_id"], r["score"], r["props"] is None)
        for r in state.select("user_id", "event_id", "score", "props").collect()
    }

    ev_path = f"{SF}/events.parquet"
    if os.path.isdir(ev_path):
        ev_path = f"{ev_path}/*.parquet"
    want = {
        tuple(r)
        for r in duckdb.sql(f"""
          SELECT user_id, event_id,
                 CASE WHEN drifted THEN user_id + 1000 END AS score,
                 drifted AS props_is_null
          FROM (
            SELECT user_id, event_id,
                   ts >= TIMESTAMP '{ts_cut}' AS drifted,
                   event_id % 10 = 0 AS del
            FROM read_parquet('{ev_path}')
            QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) = 1
          ) WHERE NOT del
        """).fetchall()
    }
    oracle = "exact" if got == want else "MISMATCH"
    print(f"# state {len(got)} rows vs oracle {len(want)}: {oracle}", file=sys.stderr)
    assert oracle == "exact", f"{len(got - want)} extra / {len(want - got)} missing"

    end_calib(spark, stamp)
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    artifact = {
        "what": "schema drift at production batch size: 10M events, drift at batch boundary "
        f"{DRIFT_BATCH} (score added, props dropped), bounded probe + union-by-name merge",
        "sf_dir": SF,
        "n_events": n_events,
        "n_batches": N_BATCHES,
        "drift_batch": DRIFT_BATCH,
        "ts_cut": ts_cut,
        "batch_wall_sec": batch_walls,
        "total_wall_sec": round(wall, 2),
        "ev_per_sec": round(n_events / wall, 1),
        "n_state_rows": len(got),
        "oracle": oracle,
        "final_columns": cols,
        **stamp,
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
