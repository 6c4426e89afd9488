"""Heterogeneous multi-maintainer fan-out (VERDICT r9 item 6).

The reference's core runtime shape is N per-table pipelines over one
cached micro-batch (/root/reference/glue/cdc_hudi.py:260-274). r9 added
three heterogeneous maintainers (plain merge, SCD2 history, pair-IVM)
that had only ever run in separate tests; this drives ONE
``CdcStreamDriver`` where table A feeds a plain keyed merge, table B's
history is SCD2-maintained, and table C feeds the near-dup pair-IVM
through the driver's ``side_processors`` attach point — 12 micro-batches
with a mid-run restart — and asserts each sink's own invariant at the
end, plus fail-stop when one table's task raises.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec
from kafka_cdc_hudi_spark.operators.temporal import scd2_history
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver

from .conftest import SF_DIR

KV_PAYLOAD = StructType(
    [StructField("id", LongType(), True), StructField("val", StringType(), True)]
)
DOC_PAYLOAD = StructType(
    [StructField("doc_id", LongType(), True), StructField("text", StringType(), True)]
)


def _dbz(op, table, after=None, before=None, ts_ms=0):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms,
         "db": "d1", "table": table}
    )


def _truth_pairs(spark, live):
    from kafka_cdc_hudi_spark.plans.catalog_text import minhash_signatures_for
    from kafka_cdc_hudi_spark.streaming.dedup_ivm import _pairs_between

    docs = spark.createDataFrame(
        sorted(live.items()), "doc_id BIGINT, text STRING"
    ).repartition(4)
    sig = minhash_signatures_for(docs).localCheckpoint(eager=False)
    return {(r.doc_a, r.doc_b) for r in _pairs_between(sig, sig).collect()}


@pytest.mark.slow
def test_three_maintainer_fanout_with_restart(spark, tmp_path):
    from kafka_cdc_hudi_spark.sources.tables import load_table
    from kafka_cdc_hudi_spark.streaming.dedup_ivm import DedupPairMaintainer

    corpus = {
        int(r.doc_id): r.text
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()
    }
    doc_ids = sorted(corpus)
    assert len(doc_ids) >= 30

    src = tmp_path / "src"
    src.mkdir()
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[
            TableSpec("d1", "t_merge", ("id",)),
            TableSpec("d1", "t_hist", ("id",)),
            TableSpec("d1", "t_docs", ("doc_id",)),
        ],
        sink_root=str(tmp_path / "sink"),
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_interval="1 seconds",
        max_workers=3,
        scd2_history=True,
        scd2_tables=("t_hist",),  # history only where it matters (new r10)
    )
    pair_m = DedupPairMaintainer(
        spark, str(tmp_path / "sig_ops"), str(tmp_path / "pair_deltas")
    )

    def ivm_side(spark_, routed, batch_id):
        # adapt the routed CDC frame (payload + mtime + _deleted) to the
        # maintainer's (op, doc_id, text, seq) contract
        batch = routed.select(
            F.when(F.col("_deleted"), F.lit("d")).otherwise(F.lit("u")).alias("op"),
            "doc_id",
            "text",
            F.col("mtime").alias("seq"),
        )
        pair_m.process(batch, batch_id)

    def make_driver():
        return CdcStreamDriver(
            spark,
            cfg,
            payload_schemas={
                "t_merge": KV_PAYLOAD, "t_hist": KV_PAYLOAD, "t_docs": DOC_PAYLOAD
            },
            side_processors={"t_docs": ivm_side},
        )

    # ---- deterministic 12-batch script touching all three tables ----
    # merge/hist: 6 keys cycling updates, key 2 deleted at batch 8;
    # docs: inserts spread over batches 0-7, two updates that CREATE a
    # near-dup pair (doc takes its neighbor's text), one delete of a doc
    # that had a pair (retraction), all replayed through the restart.
    live_docs: dict[int, str] = {}
    merge_state: dict[int, str] = {}
    hist_log = []  # (id, mtime, val, deleted)
    ts = 100
    batches = []
    chunks = [doc_ids[i::8] for i in range(8)]
    for b in range(12):
        lines = []
        # kv tables: one update each per batch
        kid = b % 6
        ts += 10
        lines.append(_dbz("u", "t_merge", after={"id": kid, "val": f"m{b}"}, ts_ms=ts))
        merge_state[kid] = f"m{b}"
        lines.append(_dbz("u", "t_hist", after={"id": kid, "val": f"h{b}"}, ts_ms=ts))
        hist_log.append((kid, ts, f"h{b}", False))
        if b == 8:
            ts += 1
            lines.append(_dbz("d", "t_merge", before={"id": 2, "val": "x"}, ts_ms=ts))
            merge_state.pop(2, None)
            lines.append(_dbz("d", "t_hist", before={"id": 2, "val": "x"}, ts_ms=ts))
            hist_log.append((2, ts, None, True))
        # docs table
        if b < 8:
            for did in chunks[b]:
                ts += 1
                lines.append(
                    _dbz("c", "t_docs", after={"doc_id": did, "text": corpus[did]}, ts_ms=ts)
                )
                live_docs[did] = corpus[did]
        elif b == 8:
            # two near-dup-creating updates
            for did, src_id in ((doc_ids[1], doc_ids[0]), (doc_ids[3], doc_ids[2])):
                ts += 1
                lines.append(
                    _dbz("u", "t_docs", after={"doc_id": did, "text": corpus[src_id]}, ts_ms=ts)
                )
                live_docs[did] = corpus[src_id]
        elif b == 10:
            # delete one side of a created pair: retraction
            ts += 1
            lines.append(
                _dbz("d", "t_docs", before={"doc_id": doc_ids[1], "text": ""}, ts_ms=ts)
            )
            live_docs.pop(doc_ids[1], None)
        batches.append(lines)

    def write(i):
        with open(src / f"b{i:02d}.json", "w") as f:
            f.write("\n".join(batches[i]) + "\n")

    # ---- first 6 batches, then stop mid-run. One write +
    # processAllAvailable per file: batch order must equal script order
    # (the pair-IVM folds its op log by batch id; the file source does
    # not promise filename order for files landing in the same instant)
    d1 = make_driver()
    q = d1.start(json_file_value_stream(spark, str(src), max_files_per_trigger=1))
    for i in range(6):
        write(i)
        q.processAllAvailable()
    q.stop()

    # ---- restart on the same checkpoint; remaining 6 batches ----
    d2 = make_driver()
    q2 = d2.start(json_file_value_stream(spark, str(src), max_files_per_trigger=1))
    for i in range(6, 12):
        write(i)
        q2.processAllAvailable()
    q2.stop()

    # ---- invariant A: plain merge == latest-per-key ----
    got_merge = {
        (r["id"], r["val"])
        for r in d2.sink_for(cfg.tables[0]).read(spark).collect()
    }
    assert got_merge == set(merge_state.items())

    # ---- invariant B: SCD2 history == batch reconstruction over the log ----
    log_df = spark.createDataFrame(
        hist_log, "id long, mtime long, val string, _deleted boolean"
    )
    want_hist = {
        (r["id"], r["mtime"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(log_df, ["id"], "mtime").drop("_deleted").collect()
    }
    got_hist = {
        (r["id"], r["mtime"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in d2.scd2_for(cfg.tables[1]).read(spark).collect()
    }
    assert got_hist == want_hist and got_hist

    # ---- invariant C: pair-IVM == full LSH recompute over live docs ----
    got_pairs = {(r.doc_a, r.doc_b) for r in pair_m.live_pairs().collect()}
    want_pairs = _truth_pairs(spark, live_docs)
    assert got_pairs == want_pairs
    # non-vacuity: the update really created a surviving pair and the
    # delete really retracted one
    assert (min(doc_ids[2], doc_ids[3]), max(doc_ids[2], doc_ids[3])) in got_pairs
    assert not any(doc_ids[1] in p for p in got_pairs)

    # ---- replay: a third driver on the same checkpoint is a no-op ----
    d3 = make_driver()
    q3 = d3.start(json_file_value_stream(spark, str(src)))
    q3.processAllAvailable()
    q3.stop()
    assert {
        (r["id"], r["val"])
        for r in d3.sink_for(cfg.tables[0]).read(spark).collect()
    } == set(merge_state.items())
    assert {(r.doc_a, r.doc_b) for r in pair_m.live_pairs().collect()} == want_pairs


def test_fanout_fail_stop(spark, tmp_path):
    """One table's task raising must stop the app (reference O7 fail-stop,
    /root/reference/glue/cdc_hudi.py:269-274), not limp along partially."""
    src = tmp_path / "src"
    src.mkdir()
    cfg = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[TableSpec("d1", "t1", ("id",)), TableSpec("d1", "t2", ("id",))],
        sink_root=str(tmp_path / "sink"),
        checkpoint_location=str(tmp_path / "ckpt"),
        max_workers=2,
    )

    def boom(df, batch_id):
        raise RuntimeError("t2 task failure")

    driver = CdcStreamDriver(
        spark,
        cfg,
        payload_schemas={"t1": KV_PAYLOAD, "t2": KV_PAYLOAD},
        transform_hooks={"t2": boom},
    )
    with open(src / "b.json", "w") as f:
        f.write(
            _dbz("c", "t1", after={"id": 1, "val": "a"}, ts_ms=1)
            + "\n"
            + _dbz("c", "t2", after={"id": 2, "val": "b"}, ts_ms=1)
            + "\n"
        )
    q = driver.start(json_file_value_stream(spark, str(src)))
    with pytest.raises(Exception, match="t2 task failure"):
        q.processAllAvailable()
    assert q.exception() is not None
    q.stop()


def test_scd2_tables_selector(spark, tmp_path):
    """scd2_tables restricts history maintenance to the named tables;
    empty keeps the pre-r10 every-table behavior. Parsed from properties."""
    cfg = JobConfig.from_properties_text(
        "scd2_history = true\n"
        "scd2_tables = t_hist, other.q\n"
        'sync_table_list = [{"db_name": "d1", "table_name": "t_hist", "primary_key": "id"}]\n'
        f"sink_root = {tmp_path}/sink\n"
        f"checkpoint_location = {tmp_path}/ckpt\n"
    )
    assert cfg.scd2_tables == ("t_hist", "other.q")

    src = tmp_path / "src"
    src.mkdir()
    cfg2 = JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=[TableSpec("d1", "t1", ("id",)), TableSpec("d1", "t2", ("id",))],
        sink_root=str(tmp_path / "sink2"),
        checkpoint_location=str(tmp_path / "ckpt2"),
        max_workers=1,
        scd2_history=True,
        scd2_tables=("t2",),
    )
    driver = CdcStreamDriver(
        spark, cfg2, payload_schemas={"t1": KV_PAYLOAD, "t2": KV_PAYLOAD}
    )
    with open(src / "b.json", "w") as f:
        f.write(
            _dbz("c", "t1", after={"id": 1, "val": "a"}, ts_ms=1)
            + "\n"
            + _dbz("c", "t2", after={"id": 2, "val": "b"}, ts_ms=2)
            + "\n"
        )
    q = driver.start(json_file_value_stream(spark, str(src)))
    q.processAllAvailable()
    q.stop()
    # t2 selected: history exists; t1 not selected: no history table
    assert driver.scd2_for(cfg2.tables[1]).read(spark) is not None
    assert driver.scd2_for(cfg2.tables[0]).read(spark) is None
