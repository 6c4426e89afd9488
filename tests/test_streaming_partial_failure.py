"""Mid-batch partial-failure fault injection at the STREAMING layer
(extends test_crash_consistency.py's sink-level kills to the fan-out
driver): one table of a multi-table micro-batch commits, then the batch
dies — on the second table's sink, or in a side processor after the sink
committed. The checkpointed replay must converge exactly-once on every
surface: already-committed sinks skip via replay protection, the failed
leg applies, and a maintained index ends equal to a from-scratch rebuild."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM, JobConfig, TableSpec
from kafka_cdc_hudi_spark.sources.kafka import json_file_value_stream
from kafka_cdc_hudi_spark.streaming.driver import CdcStreamDriver

PAYLOAD = StructType(
    [StructField("id", LongType(), True), StructField("val", StringType(), True)]
)
DOC_PAYLOAD = StructType(
    [StructField("doc_id", LongType(), True), StructField("text", StringType(), True)]
)


class InjectedCrash(RuntimeError):
    pass


def _dbz(op, table, after=None, before=None, ts_ms=0):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms,
         "db": "d1", "table": table}
    )


def _cfg(tmp_path, tables, **kw):
    return JobConfig(
        dialect=DIALECT_DEBEZIUM,
        tables=tables,
        sink_root=str(tmp_path / "sink"),
        checkpoint_location=str(tmp_path / "ckpt"),
        sink_mode="mor",
        trigger_interval="1 seconds",
        max_workers=2,
        **kw,
    )


def _state(sink, spark):
    return {(r["id"], r["val"]) for r in sink.read(spark).collect()}


def test_partial_fanout_crash_then_replay_converges(spark, tmp_path):
    """Batch 1 commits on t1 but dies on t2's sink: the query must
    fail-stop, and a fresh driver on the same checkpoint must replay batch
    1 so t1 skips (replay protection) while t2 applies — both tables land
    on the exactly-once state."""
    src = tmp_path / "src"
    src.mkdir()
    specs = [TableSpec("d1", "t1", ("id",)), TableSpec("d1", "t2", ("id",))]
    cfg = _cfg(tmp_path, specs)
    schemas = {"t1": PAYLOAD, "t2": PAYLOAD}

    driver = CdcStreamDriver(spark, cfg, payload_schemas=schemas)
    s2 = driver.sink_for(specs[1])
    real_merge = s2.merge_batch

    def dying_merge(spark_, batch, batch_id=None):
        if batch_id == 1:
            raise InjectedCrash("t2 sink dies in batch 1")
        return real_merge(spark_, batch, batch_id=batch_id)

    s2.merge_batch = dying_merge

    b0 = [
        _dbz("c", "t1", after={"id": 1, "val": "a"}, ts_ms=10),
        _dbz("c", "t2", after={"id": 1, "val": "x"}, ts_ms=10),
    ]
    with open(src / "b0.json", "w") as f:
        f.write("\n".join(b0) + "\n")
    q = driver.start(json_file_value_stream(spark, str(src)))
    q.processAllAvailable()
    assert _state(driver.sink_for(specs[0]), spark) == {(1, "a")}
    assert _state(s2, spark) == {(1, "x")}

    b1 = [
        _dbz("u", "t1", after={"id": 1, "val": "a2"}, ts_ms=20),
        _dbz("c", "t1", after={"id": 2, "val": "b"}, ts_ms=20),
        _dbz("u", "t2", after={"id": 1, "val": "x2"}, ts_ms=20),
    ]
    with open(src / "b1.json", "w") as f:
        f.write("\n".join(b1) + "\n")
    with pytest.raises(Exception) as exc:
        q.processAllAvailable()
        q.awaitTermination(30)
    assert "InjectedCrash" in str(exc.value) or "t2 sink dies" in str(exc.value)
    q.stop()

    # fresh driver, injection gone: batch 1 replays from the checkpoint
    d2 = CdcStreamDriver(spark, cfg, payload_schemas=schemas)
    q2 = d2.start(json_file_value_stream(spark, str(src)))
    q2.processAllAvailable()
    q2.stop()
    # t1: the replay must not double-apply (val applied exactly once)
    assert _state(d2.sink_for(specs[0]), spark) == {(1, "a2"), (2, "b")}
    # t2: the failed leg applied on replay
    assert _state(d2.sink_for(specs[1]), spark) == {(1, "x2")}


def test_side_processor_crash_after_sink_commit_then_replay(spark, tmp_path):
    """The maintainer dies AFTER its table's sink committed batch 1: on
    replay the sink skips (replay protection) but the side processor runs
    — the maintained BM25 index must converge to the from-scratch rebuild
    over the final corpus."""
    from kafka_cdc_hudi_spark.functions.textfns import tokens
    from kafka_cdc_hudi_spark.streaming.bm25_ivm import Bm25IndexMaintainer, bm25_topk

    src = tmp_path / "src"
    src.mkdir()
    spec = TableSpec("d1", "t_docs", ("doc_id",))
    cfg = _cfg(tmp_path, [spec])
    mb = Bm25IndexMaintainer(root=str(tmp_path / "bm25"))
    crash_on = {1}

    def side(spark_, routed, batch_id):
        if batch_id in crash_on:
            raise InjectedCrash(f"maintainer dies in batch {batch_id}")
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

    corpus = {
        1: "spark structured streaming maintains indexes",
        2: "bm25 ranks documents by term frequency",
        3: "checkpoint replay must be exactly once",
    }
    b0 = [_dbz("c", "t_docs", after={"doc_id": k, "text": t}, ts_ms=10 + k)
          for k, t in corpus.items()]
    with open(src / "b0.json", "w") as f:
        f.write("\n".join(b0) + "\n")

    mk = lambda: CdcStreamDriver(  # noqa: E731
        spark, cfg, payload_schemas={"t_docs": DOC_PAYLOAD},
        side_processors={"t_docs": side},
    )
    d1 = mk()
    q = d1.start(json_file_value_stream(spark, str(src)))
    q.processAllAvailable()

    corpus[2] = "bm25 weighting replaced by fresh streaming text"
    b1 = [_dbz("u", "t_docs", after={"doc_id": 2, "text": corpus[2]}, ts_ms=20)]
    with open(src / "b1.json", "w") as f:
        f.write("\n".join(b1) + "\n")
    with pytest.raises(Exception):
        q.processAllAvailable()
        q.awaitTermination(30)
    q.stop()
    # sink committed batch 1 before the side processor died
    assert d1.sink_for(spec).last_batch_id() == 1

    crash_on.clear()
    d2 = mk()
    q2 = d2.start(json_file_value_stream(spark, str(src)))
    q2.processAllAvailable()
    q2.stop()
    # sink replay-skipped; the maintainer absorbed the replayed batch
    assert d2.sink_for(spec).last_batch_id() == 1
    queries = spark.createDataFrame(
        [(100, corpus[2])], "query_id BIGINT, text STRING"
    )
    docs = spark.createDataFrame(sorted(corpus.items()), "doc_id BIGINT, text STRING")
    posts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
    got = {(r["query_id"], r["doc_id"], r["rank"])
           for r in mb.topk(spark, queries, k=3).collect()}
    want = {(r["query_id"], r["doc_id"], r["rank"])
            for r in bm25_topk(queries, posts, dl, k=3).collect()}
    assert got == want
