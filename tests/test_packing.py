"""Sequence-packing operator: concat-and-chunk semantics, determinism under
repartitioning, and the one-shuffle plan shape."""

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.packing import pack_sequences, shard_assign

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_concat_and_chunk_math(spark):
    # one shard (n_shards=1) -> pure sequential packing by doc_id
    rows = [
        (1, "a b c"),          # 3 tokens, cum_before 0  -> seq 0 off 0
        (2, "d e f g"),        # 4 tokens, cum_before 3  -> seq 0 off 3
        (3, "h i j k l m n"),  # 7 tokens, cum_before 7  -> seq 0 off 7 (straddles)
        (4, "o p"),            # 2 tokens, cum_before 14 -> seq 1 off 4
    ]
    out = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(_docs(spark, rows), seq_tokens=10, n_shards=1).collect()
    }
    assert out[1] == (0, 3, 0, 0)
    assert out[2] == (0, 4, 0, 3)
    assert out[3] == (0, 7, 0, 7)  # starts in seq 0, straddles into seq 1
    assert out[4] == (0, 2, 1, 4)  # 14 div 10 = 1, 14 mod 10 = 4


def test_no_doc_dropped_and_offsets_bounded(spark):
    rows = [(i, "w " * (i % 17 + 1)) for i in range(100)]
    out = pack_sequences(_docs(spark, rows), seq_tokens=32, n_shards=4)
    assert out.count() == 100
    bad = out.filter(
        (F.col("offset_in_seq") < 0) | (F.col("offset_in_seq") >= 32) | (F.col("seq_id") < 0)
    )
    assert bad.count() == 0


def test_deterministic_under_repartition(spark):
    rows = [(i, f"tok{i} " * (i % 7 + 1)) for i in range(200)]
    d = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(d, seq_tokens=64, n_shards=8).collect()))
    b = sorted(
        map(tuple, pack_sequences(d.repartition(13), seq_tokens=64, n_shards=8).collect())
    )
    assert a == b


def test_shard_assign_range_and_stability(spark):
    d = _docs(spark, [(i, "x") for i in range(500)])
    s = d.select(shard_assign("doc_id", 8, "pack_v1").alias("s"))
    vals = {r["s"] for r in s.collect()}
    assert vals <= set(range(8))
    assert len(vals) == 8  # 500 keys hit all 8 shards


def test_single_shuffle_plan(spark):
    d = _docs(spark, [(i, "x y z") for i in range(50)])
    plan = (
        pack_sequences(d, seq_tokens=16, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash-partition exchange for the shard window; no extra shuffles
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_materialized_sequences_are_full_except_shard_tail(spark):
    """Every materialized sequence except each shard's last is exactly L
    tokens, and per-shard token totals equal the sum of its documents'
    token counts (no token lost or duplicated across straddle splits)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _PACK_L,
        dataset_pack_materialize,
        dataset_pack_sequences,
    )

    out = dataset_pack_materialize(spark, SF_DIR).collect()
    last = {}
    for r in out:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["seq_id"])
    for r in out:
        if r["seq_id"] != last[r["shard"]]:
            assert r["n_tokens"] == _PACK_L, (r["shard"], r["seq_id"], r["n_tokens"])
        assert r["n_tokens"] <= _PACK_L
    per_shard = {}
    for r in out:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + r["n_tokens"]
    asg = dataset_pack_sequences(spark, SF_DIR).collect()
    want = {}
    for r in asg:
        want[r["shard"]] = want.get(r["shard"], 0) + r["n_tokens"]
    assert per_shard == want
