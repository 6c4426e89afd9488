"""Verify drive: CDC streaming pipeline end-to-end vs DuckDB oracle.

The committed form of the .claude/skills/verify drive recipe: generate
Debezium envelopes from the events fixture, stream them (with injected
corrupt lines) through the full CdcStreamDriver into a MOR sink, compare
the final state against a DuckDB latest-per-key oracle, then restart on
the same checkpoint and assert nothing changes.

    python scripts/verify_drive.py    # ~60 s, prints DRIVE OK
"""
import os, shutil, sys, tempfile

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb

from kafka_cdc_hudi_spark.session import get_spark
from kafka_cdc_hudi_spark.config import JobConfig, TableSpec, DIALECT_DEBEZIUM
from kafka_cdc_hudi_spark.plans.cdc_fixtures import debezium_envelopes
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream
from kafka_cdc_hudi_spark.sources.tables import load_table
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver

SF = "/root/testdata/sf0.001"
spark = get_spark(shuffle_partitions=8)

work = tempfile.mkdtemp(prefix="verify_drive_")
src = os.path.join(work, "src")
os.makedirs(src)

events = load_table(spark, SF, "events")
rows = [r.value for r in debezium_envelopes(events).collect()]
half = len(rows) // 2
with open(os.path.join(src, "b0.json"), "w") as f:
    f.write("\n".join(rows[:half]) + "\nnot json at all\n")
with open(os.path.join(src, "b1.json"), "w") as f:
    f.write('{"broken": \n' + "\n".join(rows[half:]) + "\n")

spec = TableSpec("test_db", "events", ("event_id",))
cfg = JobConfig(
    dialect=DIALECT_DEBEZIUM,
    tables=[spec],
    sink_root=os.path.join(work, "sink"),
    checkpoint_location=os.path.join(work, "ckpt"),
    trigger_interval="0 seconds",
    sink_mode="mor",
)
drv = CdcStreamDriver(spark, cfg)
q = drv.start(json_file_value_stream(spark, src, max_files_per_trigger=1))
q.processAllAvailable()
q.stop()

state = drv.sink_for(spec).read(spark)
got = sorted(
    (r.event_id, r.user_id, r.event_type)
    for r in state.select("event_id", "user_id", "event_type").collect()
)

con = duckdb.connect()
exp = sorted(
    tuple(r)
    for r in con.sql(
        f"""
        SELECT event_id, user_id, event_type FROM (
          SELECT *, row_number() OVER (PARTITION BY event_id
                                       ORDER BY ts DESC, event_id DESC) rn
          FROM '{SF}/events.parquet')
        WHERE rn = 1 AND event_id % 10 <> 0
        """
    ).fetchall()
)
assert got == exp, f"state mismatch: {len(got)} vs {len(exp)}"
print("STATE MATCH:", len(got), "rows")

drv2 = CdcStreamDriver(spark, cfg)
q2 = drv2.start(json_file_value_stream(spark, src))
q2.processAllAvailable()
q2.stop()
got2 = sorted(
    (r.event_id, r.user_id, r.event_type)
    for r in drv2.sink_for(spec).read(spark)
    .select("event_id", "user_id", "event_type").collect()
)
assert got2 == got, "restart changed state"
print("RESTART IDEMPOTENT")

# ---- DMS dialect leg: same events fixture through the DMS envelope
# format (VERDICT r6 item 5). The precombine value is metadata.timestamp,
# an ISO-8601 STRING ordered lexicographically — the fixed-width
# serialization makes that identical to ts order, which the oracle checks
# independently. Position-split batches (out-of-order string mtimes cross
# batch boundaries) + MOR sink; control records (event_id % 97 == 0)
# replace their data rows and must be dropped by the parse.
from kafka_cdc_hudi_spark.config import DIALECT_DMS
from kafka_cdc_hudi_spark.plans.cdc_fixtures import dms_envelopes

dms_src = os.path.join(work, "dms_src")
os.makedirs(dms_src)
dms_rows = [r.value for r in dms_envelopes(events).collect()]
third = len(dms_rows) // 3
for i in range(3):
    chunk = dms_rows[i * third : (i + 1) * third if i < 2 else len(dms_rows)]
    with open(os.path.join(dms_src, f"b{i}.json"), "w") as f:
        f.write("\n".join(chunk) + ("\nnot json\n" if i == 1 else "\n"))

dms_cfg = JobConfig(
    dialect=DIALECT_DMS,
    tables=[spec],
    sink_root=os.path.join(work, "dms_sink"),
    checkpoint_location=os.path.join(work, "dms_ckpt"),
    trigger_interval="0 seconds",
    sink_mode="mor",
)
dms_drv = CdcStreamDriver(spark, dms_cfg)
dq = dms_drv.start(json_file_value_stream(spark, dms_src, max_files_per_trigger=1))
dq.processAllAvailable()
dq.stop()

dms_got = sorted(
    (r.event_id, r.user_id, r.event_type)
    for r in dms_drv.sink_for(spec).read(spark)
    .select("event_id", "user_id", "event_type").collect()
)
dms_exp = sorted(
    tuple(r)
    for r in con.sql(
        f"""
        SELECT event_id, user_id, event_type FROM (
          SELECT *, row_number() OVER (PARTITION BY event_id
                                       ORDER BY ts DESC, event_id DESC) rn
          FROM '{SF}/events.parquet')
        WHERE rn = 1 AND event_id % 10 <> 0 AND event_id % 97 <> 0
        """
    ).fetchall()
)
assert dms_got == dms_exp, f"DMS state mismatch: {len(dms_got)} vs {len(dms_exp)}"
print("DMS STATE MATCH:", len(dms_got), "rows")

shutil.rmtree(work, ignore_errors=True)
print("DRIVE OK")
