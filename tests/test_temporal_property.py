"""Property-based check of the as-of join against a pure-Python model:
backward-inclusive, per-key, null right timestamps/keys never match,
unmatched left rows survive with null asof columns."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_cdc_hudi_spark.operators.temporal import asof_join

keys = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
tss = st.one_of(st.none(), st.integers(min_value=0, max_value=9))

left_strategy = st.lists(
    st.tuples(keys, st.integers(min_value=0, max_value=9)), min_size=1, max_size=8
)
right_strategy = st.lists(
    st.tuples(keys, tss, st.integers(min_value=0, max_value=99)), min_size=0, max_size=8
)


def model(left, right):
    out = {}
    for li, (k, lts) in enumerate(left):
        best = None
        if k is not None:
            for rk, rts, px in right:
                if rk == k and rts is not None and rts <= lts:
                    if best is None or rts > best[0]:
                        best = (rts, px)
        out[li] = best
    return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_matches_model(spark, left, right):
    # make (key, ts) unique on the right: the operator's documented
    # determinism precondition (ties at identical timestamps are ambiguous
    # in any as-of engine)
    seen = set()
    right = [r for r in right if not (r[:2] in seen or seen.add(r[:2]))]

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "li int, k int, ts int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, px int")
    got = {
        r["li"]: (None if r["asof_ts"] is None else (r["asof_ts"], r["asof_px"]))
        for r in asof_join(ldf, rdf, on=["k"], prefix="asof_").collect()
    }
    exp = model(left, right)
    assert got == exp, f"left={left} right={right}"
