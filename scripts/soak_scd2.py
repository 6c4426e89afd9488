"""Realistic-churn soak for the incremental SCD2 maintainer (r9 scale
cadence for the round's born family, streaming/scd2.py).

The claim under test is the same one the pair-IVM soak pins: per-batch
cost tracks CHURN (affected keys' log rows), not corpus size. The history
table runs in MOR layout — churn spread uniformly across the key space
touches every bucket of a bucketed layout, so delta commits + read-time
fold is the honest scale shape for this access pattern; the affected-key
reads stay scan-pruned because ``read_where_keys`` pushes the key
predicate BELOW the MOR fold.

Script: full-corpus ingest of the events table as a user-profile change
log (every event is a version change for its user), then N batches of
fixed-absolute churn — each batch touches CHURN_USERS random users with
one new change event: 70% in-order updates, 15% LATE events (timestamp
strictly inside the user's existing range — exercises the interval-split
rebuild), 15% delete tombstones. At checkpoints the maintained history
must equal ``scd2_history`` recomputed over the full log (count + row
checksum, both engines Spark so the comparison is exact).

Run at two corpus sizes with the SAME absolute churn:

    python scripts/soak_scd2.py /root/testdata/sf0.1 out_sf01.json
    python scripts/soak_scd2.py /root/repo/.scaledata/sf1 out_sf1.json
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# calib_gate lives next to this script; the repo-root insert above doesn't
# cover `python -m scripts.foo`-style invocation (ADVICE r10)
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from kafka_cdc_hudi_spark.operators.temporal import scd2_history  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402
from kafka_cdc_hudi_spark.streaming.scd2 import Scd2HistoryMaintainer  # noqa: E402
from calib_gate import end_calib, gated_calib  # noqa: E402

N_BATCHES = int(os.environ.get("SOAK_SCD2_BATCHES", "24"))
CHURN_USERS = int(os.environ.get("SOAK_SCD2_USERS", "200"))
CHECK_EVERY = int(os.environ.get("SOAK_SCD2_CHECK_EVERY", "8"))
SEED = 20260815

SCHEMA = "user_id BIGINT, mtime BIGINT, event_id BIGINT, val STRING, _deleted BOOLEAN"
HASH_COLS = ["user_id", "mtime", "event_id", "val", "valid_from", "valid_to", "is_current"]


def _checksum(df):
    """(row count, order-independent checksum) over HASH_COLS."""
    r = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in HASH_COLS]), F.lit(1_000_000_007))
        ).alias("h"),
    ).collect()[0]
    return int(r["n"]), int(r["h"] or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark(app_name="soak_scd2")
    spark.sparkContext.setLogLevel("ERROR")
    # ambient-load gate (VERDICT r9 item 5), same stamp as bench/sweep
    stamp = gated_calib(spark)

    rng = random.Random(SEED)

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts"))).alias("mtime"),
            "event_id",
            F.col("event_type").alias("val"),
        )
        .withColumn("_deleted", F.lit(False))
    )
    n0 = ev.count()
    # per-user ts range for late-event synthesis: one row per USER
    # (bounded by key cardinality, not corpus rows — a soak-script-only
    # collect, the engine never does this)
    spans = {
        int(r["user_id"]): (int(r["lo"]), int(r["hi"]))
        for r in ev.groupBy("user_id")
        .agg(F.min("mtime").alias("lo"), F.max("mtime").alias("hi"))
        .collect()
    }
    live_users = sorted(spans)
    now = max(hi for _, hi in spans.values()) + 1_000_000
    next_eid = 10_000_000_000

    root = tempfile.mkdtemp(prefix="soak_scd2_")
    m = Scd2HistoryMaintainer(
        root=root,
        keys=["user_id"],
        ts_col="mtime",
        tiebreakers=["event_id"],
        history_mode="mor",
        history_compact_every=8,
        log_compact_every=8,
    )

    t0 = time.perf_counter()
    m.apply_batch(spark, ev, batch_id=0)
    t_ingest = round(time.perf_counter() - t0, 2)
    print(f"# ingest: {n0} change events in {t_ingest}s", file=sys.stderr)

    batches, checks = [], []
    for bid in range(1, N_BATCHES + 1):
        rows = []
        picked = rng.sample(live_users, min(CHURN_USERS, len(live_users)))
        for u in picked:
            lo, hi = spans[u]
            r = rng.random()
            now += 1000
            next_eid += 1
            if r < 0.70 or lo >= hi - 2:
                rows.append((u, now, next_eid, f"upd{next_eid}", False))
                spans[u] = (lo, max(hi, now))
            elif r < 0.85:
                # LATE event strictly inside the existing interval chain
                late = rng.randrange(lo + 1, hi)
                rows.append((u, late, next_eid, f"late{next_eid}", False))
            else:
                rows.append((u, now, next_eid, None, True))
                spans[u] = (lo, max(hi, now))
        df = spark.createDataFrame(rows, SCHEMA)
        t0 = time.perf_counter()
        m.apply_batch(spark, df, batch_id=bid)
        wall = round(time.perf_counter() - t0, 2)
        batches.append({"bid": bid, "n_changed": len(rows), "wall_s": wall})
        print(f"# batch {bid}: {len(rows)} change events, {wall}s", file=sys.stderr)
        if bid % CHECK_EVERY == 0 or bid == N_BATCHES:
            t0 = time.perf_counter()
            got = _checksum(m.read(spark))
            log_df = m.log.read(spark)
            want = _checksum(
                scd2_history(
                    log_df,
                    ["user_id"],
                    "mtime",
                    tiebreakers=["event_id"],
                    deleted_col="__op_deleted",
                )
            )
            ok = got == want
            checks.append(
                {"bid": bid, "history_rows": got[0], "match": ok,
                 "check_s": round(time.perf_counter() - t0, 2)}
            )
            print(
                f"# checkpoint {bid}: {got[0]} history rows, match={ok}"
                + ("" if ok else f"  got={got} want={want}"),
                file=sys.stderr,
            )

    churn_walls = [b["wall_s"] for b in batches]
    result = {
        "sf_dir": sf_dir,
        "corpus_events": n0,
        "n_users": len(live_users),
        "churn_users_per_batch": CHURN_USERS,
        "n_batches": N_BATCHES,
        "history_mode": "mor",
        "ingest_s": t_ingest,
        "churn_wall_mean_s": round(sum(churn_walls) / len(churn_walls), 2),
        "churn_wall_max_s": max(churn_walls),
        "batches": batches,
        "checkpoints": checks,
        "all_checks_match": all(c["match"] for c in checks),
        **end_calib(spark, stamp),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()
    sys.exit(0 if result["all_checks_match"] else 1)


if __name__ == "__main__":
    main()
