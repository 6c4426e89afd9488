"""10M-event streaming drive WITH a maintained BM25 index attached
(VERDICT r11 item 4).

SOAK_10M_r11 drove parse -> route -> dedup -> merge alone; the maintained-
structure soaks ran at fixed small churn with no co-load. This soak does
both in ONE driver: 5 micro-batches of 1M/1.5M/2M/2.5M/3M events (10M
total, .scaledata/sf10) interleaved with a `documents` CDC stream whose
churn is PROPORTIONAL to the batch's event count (0.1%), with
`Bm25IndexMaintainer` attached as a side_processor of the same driver.
Batch 0 additionally bootstraps the full 500k-doc corpus through the
maintainer (ingest under co-load).

Recorded per batch: the engine's batchDuration (driver wall: parse + route
+ both tables' merges + the side processor) AND the maintainer's own wall
(timed inside the side processor) — the driver-vs-maintainer split the
artifact exists to show. At 3 checkpoints the maintained index's top-k
must EXACTLY equal a from-scratch BM25 build over the live corpus; the
final events MOR state is oracle-checked against DuckDB over all 10M rows.

Usage: python scripts/soak_10m_ivm.py [sf_dir] [out.json]
Needs SPARK_GRAFT_DRIVER_MEM=32g for the sf10 default.
"""

from __future__ import annotations

import glob
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec  # noqa: E402
from kafka_cdc_hudi_spark.functions.textfns import tokens  # noqa: E402
from kafka_cdc_hudi_spark.plans.cdc_fixtures import debezium_envelopes  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402
from kafka_cdc_hudi_spark.streaming.bm25_ivm import Bm25IndexMaintainer, bm25_topk  # noqa: E402
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver  # noqa: E402
from calib_gate import end_calib, gated_calib  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else None

#: event slots per batch out of 20 equal hash slices — 1M/1.5M/2M/2.5M/3M
#: at sf10, so the churn-proportionality of the maintainer is visible
BATCH_SLOTS = [2, 3, 4, 5, 6]
CHURN_FRAC = 0.001  # docs churned per batch = frac * batch's event count
K, N_QUERIES = 10, 8
SEED = 20260816

DOC_PAYLOAD = StructType(
    [StructField("doc_id", LongType(), True), StructField("text", StringType(), True)]
)


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    stamp = gated_calib(spark)
    print(f"# calib: {stamp}", file=sys.stderr)

    rng = random.Random(SEED)
    events = load_table(spark, SF, "events")
    n_events_total = events.count()
    live = {
        int(r["doc_id"]): r["text"]
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    n_docs0 = len(live)
    next_id = max(live) + 1
    queries_rows = [(1_000_000 + i, live[k]) for i, k in enumerate(sorted(live)[:N_QUERIES])]
    queries = spark.createDataFrame(
        queries_rows, "query_id BIGINT, text STRING"
    ).localCheckpoint()

    src = tempfile.mkdtemp(prefix="soak10m_src_")
    work = tempfile.mkdtemp(prefix="soak10m_")
    ev_spec = TableSpec(db="test_db", table="events", primary_keys=("user_id",))
    doc_spec = TableSpec(db="test_db", table="documents", primary_keys=("doc_id",))
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[ev_spec, doc_spec],
        sink_root=os.path.join(work, "sink"),
        checkpoint_location=os.path.join(work, "ckpt"),
        sink_mode="mor",
        trigger_interval="0 seconds",
        max_workers=2,
    )
    mb = Bm25IndexMaintainer(root=os.path.join(work, "bm25"), compact_every=4)
    maint_walls: dict[int, float] = {}

    def bm25_side(spark_, routed, batch_id):
        t0 = time.perf_counter()
        mb.process(
            spark_,
            routed.select(
                F.when(F.col("_deleted"), F.lit("d")).otherwise(F.lit("u")).alias("op"),
                "doc_id",
                "text",
                F.col("mtime").alias("seq"),
            ),
            batch_id,
        )
        maint_walls[batch_id] = round(time.perf_counter() - t0, 2)

    driver = CdcStreamDriver(
        spark,
        cfg,
        payload_schemas={"documents": DOC_PAYLOAD},
        side_processors={"documents": bm25_side},
    )

    # ---- pre-materialize the event envelope slices (untimed prep) --------
    env = debezium_envelopes(events).select(
        "value", F.pmod(F.xxhash64("value"), F.lit(20)).alias("slot")
    )
    ev_dir = os.path.join(work, "ev_slices")
    env.write.partitionBy("slot").mode("overwrite").text(ev_dir)

    def _dbz_doc(op, did, text, ts):
        before = {"doc_id": did, "text": None} if op == "d" else None
        after = None if op == "d" else {"doc_id": did, "text": text}
        return json.dumps(
            {"before": before, "after": after, "op": op, "ts_ms": ts,
             "db": "test_db", "table": "documents"}
        )

    seq = 1_000_000_000
    lo = 0
    # planning mutates plan_live; effects are applied to the checkpoint
    # corpus `live` only as batches are PUBLISHED, so checkpoint rebuilds
    # see the batch-prefix corpus, not the final one
    plan_live = dict(live)
    batch_plan = []  # (slots, doc_lines, boot_dir, effects)
    for bi, slots in enumerate(BATCH_SLOTS):
        my_slots = list(range(lo, lo + slots))
        lo += slots
        doc_lines: list[str] = []
        effects: list[tuple] = []
        if bi == 0:
            # corpus bootstrap: all docs as inserts, ts = 1_000_000 + doc_id
            boot = os.path.join(work, "boot_docs")
            spark.createDataFrame(
                sorted(live.items()), "doc_id BIGINT, text STRING"
            ).select(
                F.to_json(
                    F.struct(
                        F.lit(None).cast(DOC_PAYLOAD).alias("before"),
                        F.struct("doc_id", "text").alias("after"),
                        F.lit("c").alias("op"),
                        (F.lit(1_000_000) + F.col("doc_id")).alias("ts_ms"),
                        F.lit("test_db").alias("db"),
                        F.lit("documents").alias("table"),
                    )
                ).alias("value")
            ).coalesce(4).write.mode("overwrite").text(boot)
            batch_plan.append((my_slots, None, boot, []))
            continue
        n_ev = slots * (n_events_total // 20)
        n_churn = max(1, int(n_ev * CHURN_FRAC))
        n_del = n_churn // 5
        n_ins = n_churn // 5
        n_upd = n_churn - n_del - n_ins
        ids = sorted(plan_live)
        for i in rng.sample(ids, n_del):
            seq += 1
            doc_lines.append(_dbz_doc("d", i, None, seq))
            effects.append((i, None))
            del plan_live[i]
        ids = sorted(plan_live)
        donors = rng.sample(ids, n_upd)
        for i, donor in zip(rng.sample(ids, n_upd), donors):
            wa, wb = plan_live[i].split(), plan_live[donor].split()
            t = " ".join(wa[: len(wa) // 2] + wb[len(wb) // 2 :])
            seq += 1
            doc_lines.append(_dbz_doc("u", i, t, seq))
            effects.append((i, t))
            plan_live[i] = t
        for _ in range(n_ins):
            t = plan_live[rng.choice(sorted(plan_live))]
            seq += 1
            doc_lines.append(_dbz_doc("c", next_id, t, seq))
            effects.append((next_id, t))
            plan_live[next_id] = t
            next_id += 1
        batch_plan.append((my_slots, doc_lines, None, effects))

    def publish(bi):
        """Concatenate the batch's event slices + doc lines into ONE file,
        atomically renamed into the source dir (batch = one micro-batch;
        the file-ordering trap from PLANS.md)."""
        my_slots, doc_lines, boot_dir, effects = batch_plan[bi]
        tmp = os.path.join(work, f"stage_b{bi}.txt")
        n_ev = 0
        with open(tmp, "wb") as out:
            for s in my_slots:
                for part in sorted(glob.glob(os.path.join(ev_dir, f"slot={s}", "part-*"))):
                    with open(part, "rb") as f:
                        data = f.read()
                        n_ev += data.count(b"\n")
                        out.write(data)
            if boot_dir is not None:
                for part in sorted(glob.glob(os.path.join(boot_dir, "part-*"))):
                    with open(part, "rb") as f:
                        out.write(f.read())
            if doc_lines:
                out.write(("\n".join(doc_lines) + "\n").encode())
        os.rename(tmp, os.path.join(src, f"b{bi}.txt"))
        for k, v in effects:
            if v is None:
                live.pop(k, None)
            else:
                live[k] = v
        return n_ev

    def topk_set(df):
        return {(r["query_id"], r["doc_id"], r["rank"]) for r in df.collect()}

    def rebuild_topk():
        docs = spark.createDataFrame(
            sorted(live.items()), "doc_id BIGINT, text STRING"
        ).repartition(spark.sparkContext.defaultParallelism)
        posts = (
            docs.select("doc_id", F.explode(tokens("text")).alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dl = docs.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
        return bm25_topk(queries, posts, dl, k=K)

    q = driver.start(json_file_value_stream(spark, src, max_files_per_trigger=1))
    batches, checks = [], []
    t_total0 = time.perf_counter()
    for bi in range(len(batch_plan)):
        n_ev = publish(bi)
        t0 = time.perf_counter()
        q.processAllAvailable()
        wall = round(time.perf_counter() - t0, 2)
        churned = len(batch_plan[bi][1] or [])
        batches.append(
            {
                "batch": bi,
                "events": n_ev,
                "docs_churned": churned if bi else n_docs0,
                "wall_sec": wall,
                "maintainer_sec": maint_walls.get(bi),
                "driver_sec": round(wall - (maint_walls.get(bi) or 0.0), 2),
            }
        )
        print(f"# b{bi}: {n_ev} ev, {churned if bi else n_docs0} doc ops, "
              f"wall {wall}s (maintainer {maint_walls.get(bi)}s)", file=sys.stderr)
        if bi >= 2:  # checkpoints after b2, b3, b4 — 3/3
            t0 = time.perf_counter()
            ok = topk_set(mb.topk(spark, queries, k=K)) == topk_set(rebuild_topk())
            checks.append({"after_batch": bi, "exact": bool(ok),
                           "check_sec": round(time.perf_counter() - t0, 2)})
            print(f"# checkpoint b{bi}: exact={ok}", file=sys.stderr)
            assert ok, f"maintained BM25 diverged from rebuild after batch {bi}"
    total_wall = round(time.perf_counter() - t_total0, 2)
    q.stop()

    # final events MOR state oracle vs DuckDB over all 10M rows
    state = driver.sink_for(ev_spec).read(spark)
    got = {(r["user_id"], r["event_id"]) for r in state.collect()}
    ev_path = f"{SF}/events.parquet"
    if os.path.isdir(ev_path):
        ev_path = f"{ev_path}/*.parquet"
    want = {
        tuple(r)
        for r in duckdb.sql(f"""
          SELECT user_id, event_id FROM (
            SELECT user_id, event_id, event_id % 10 = 0 AS del
            FROM read_parquet('{ev_path}')
            QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) = 1
          ) WHERE NOT del
        """).fetchall()
    }
    events_oracle = got == want
    print(f"# events MOR state: {'oracle-exact' if events_oracle else 'MISMATCH'} "
          f"({len(got)} rows)", file=sys.stderr)
    assert events_oracle

    stamp = end_calib(spark, stamp)
    driven = sum(b["events"] for b in batches)
    artifact = {
        "what": "10M-event streaming drive with Bm25IndexMaintainer attached "
                "(scripts/soak_10m_ivm.py, VERDICT r11 item 4)",
        "sf_dir": SF,
        "n_events": driven,
        "n_docs_corpus": n_docs0,
        "churn_frac": CHURN_FRAC,
        "batches": batches,
        "ev_per_sec": round(driven / sum(b["wall_sec"] for b in batches), 1),
        "total_wall_sec": total_wall,
        "checkpoints": checks,
        "events_mor_oracle": "exact",
        **stamp,
    }
    line = json.dumps(artifact)
    print(line)
    if OUT:
        with open(OUT, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
