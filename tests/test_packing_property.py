"""Property-based invariants for sequence packing and exact floor division
(hypothesis drives the input shapes; Spark evaluates on small frames)."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.timefns import floordiv_long
from kafka_cdc_hudi_spark.operators.packing import pack_sequences

_LONGS = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_DIVISORS = st.integers(min_value=1, max_value=2**40)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_LONGS, _DIVISORS), min_size=1, max_size=20))
def test_floordiv_long_matches_python_floordiv(spark, pairs):
    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long")
    for i, (a, b) in enumerate(pairs):
        got = (
            df.filter(F.col("i") == i)
            .select(floordiv_long(F.col("a"), b).alias("q"))
            .collect()[0]["q"]
        )
        assert got == a // b, f"floordiv_long({a}, {b}) = {got}, want {a // b}"


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    seq_tokens=st.integers(min_value=1, max_value=64),
    n_shards=st.integers(min_value=1, max_value=5),
)
def test_pack_sequences_invariants(spark, docs, seq_tokens, n_shards):
    """For every doc: seq_id * L + offset_in_seq == cum_before (internal
    consistency), offsets bounded, no doc dropped, and per-shard packing
    equals the sequential Python reference."""
    rows = [(doc_id, "w " * n_toks) for doc_id, n_toks in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_tokens=seq_tokens, n_shards=n_shards).collect()
    }
    assert len(out) == len(docs)
    # python reference: group by shard, order by doc_id, running cumsum
    by_shard: dict[int, list] = {}
    for doc_id, n_toks in sorted(docs):
        r = out[doc_id]
        assert r["n_tokens"] == n_toks
        assert 0 <= r["offset_in_seq"] < seq_tokens
        by_shard.setdefault(r["shard"], []).append((doc_id, n_toks, r))
    for shard_rows in by_shard.values():
        cum = 0
        for doc_id, n_toks, r in shard_rows:  # already doc_id-ordered
            assert r["seq_id"] * seq_tokens + r["offset_in_seq"] == cum, (
                f"doc {doc_id}: seq {r['seq_id']}*{seq_tokens}+{r['offset_in_seq']} != cum {cum}"
            )
            cum += n_toks
