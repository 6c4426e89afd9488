"""Property-based check of merge semantics (SURVEY §7 hard-part 1).

Model: a driver-side pure-Python fold with the documented semantics —
  - in-batch dedup: max by (mtime, seq) per key
  - vs stored state: incoming wins when mtime >= stored mtime (Hudi
    DefaultHoodieRecordPayload tie behavior), else stored survives
  - a winning delete removes the key (a LATER batch carrying an older
    non-delete event for that key legitimately re-inserts it — sequential
    fold, not global max; matches Hudi delete-then-late-event behavior)
  - replaying the final batch must not change the state (at-least-once
    foreachBatch, SURVEY §7 hard-part 5)

Hypothesis drives random event streams (key/mtime collisions forced by tiny
domains, arbitrary batch splits, random delete flags) through the REAL
merge_upsert and compares against the model.
"""

from __future__ import annotations

from dataclasses import dataclass

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F  # noqa: F401

from kafka_cdc_hudi_spark.operators.merge import merge_upsert


@dataclass(frozen=True)
class Ev:
    key: int
    mtime: int
    val: int
    deleted: bool
    seq: int  # unique per event — arrival order, the deterministic tiebreak


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key: tiny domain -> collisions
        st.integers(min_value=0, max_value=5),  # mtime: ties likely
        st.integers(min_value=0, max_value=99),  # payload value
        st.booleans(),  # deleted
    ),
    min_size=1,
    max_size=14,
)
splits_strategy = st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=3)


def model_fold(batches: list[list[Ev]]) -> dict[int, Ev]:
    state: dict[int, Ev] = {}
    for batch in batches:
        best: dict[int, Ev] = {}
        for ev in batch:
            cur = best.get(ev.key)
            if cur is None or (ev.mtime, ev.seq) > (cur.mtime, cur.seq):
                best[ev.key] = ev
        for k, ev in best.items():
            cur = state.get(k)
            if cur is None or ev.mtime >= cur.mtime:  # incoming wins ties
                if ev.deleted:
                    state.pop(k, None)
                else:
                    state[k] = ev
    return state


def spark_fold(spark, batches: list[list[Ev]]):
    schema = "key int, mtime int, val int, _deleted boolean, seq int"
    state = None
    last = None
    for batch in batches:
        rows = [(e.key, e.mtime, e.val, e.deleted, e.seq) for e in batch]
        last = spark.createDataFrame(rows, schema)
        state = merge_upsert(state, last, ["key"], tiebreakers=["seq"])
    return state, last


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(raw=events_strategy, splits=splits_strategy)
def test_merge_matches_model(spark, raw, splits):
    events = [Ev(k, m, v, d, seq) for seq, (k, m, v, d) in enumerate(raw)]
    batches: list[list[Ev]] = []
    i = 0
    for size in splits:
        if i >= len(events):
            break
        batches.append(events[i : i + size])
        i += size
    if i < len(events):
        batches.append(events[i:])

    state, last_batch = spark_fold(spark, batches)
    got = {r["key"]: (r["mtime"], r["val"]) for r in state.collect()}
    exp = {k: (e.mtime, e.val) for k, e in model_fold(batches).items()}
    assert got == exp, f"batches={batches}"

    # at-least-once replay: merging the final batch again changes nothing
    replayed = merge_upsert(state, last_batch, ["key"], tiebreakers=["seq"])
    got2 = {r["key"]: (r["mtime"], r["val"]) for r in replayed.collect()}
    assert got2 == exp, f"replay diverged: batches={batches}"
