"""Incrementally maintained IVF index (streaming/ann_ivm.py): after any
prefix of CDC batches, querying the maintained index must give EXACTLY the
results of rebuilding the static index over the live corpus — including
updates that move a vector to another cell and deletes that evict a
former top-k neighbor — and replays must be no-ops."""

import numpy as np

from kafka_cdc_hudi_spark.operators.similarity import (
    ivf_assign,
    ivf_static_codebook,
    ivf_topk,
)
from kafka_cdc_hudi_spark.streaming.ann_ivm import AnnIndexMaintainer

DIM, CELLS, K, PROBE = 8, 4, 3, 2
CENTS = ivf_static_codebook(DIM, CELLS)
SCHEMA = "op STRING, vec_id BIGINT, embedding ARRAY<FLOAT>, seq BIGINT"


def _vec(i: int) -> list[float]:
    rng = np.random.RandomState(1000 + i)
    v = rng.randn(DIM)
    return [float(x) for x in (v / np.linalg.norm(v)).astype(np.float32)]


def _cell_of(v: list[float]) -> int:
    return int(np.argmax(CENTS @ np.asarray(v)))


def _near(cell: int, salt: int) -> list[float]:
    """A vector that assigns to ``cell``: the centroid plus a small
    deterministic perturbation (argmax is stable under it)."""
    rng = np.random.RandomState(5000 + salt)
    v = CENTS[cell] + 0.01 * rng.randn(DIM)
    v = [float(x) for x in (v / np.linalg.norm(v)).astype(np.float32)]
    assert _cell_of(v) == cell
    return v


def _topk_sets(df):
    return {(r["qid"], r["nid"], r["rank"]) for r in df.collect()}


def _rebuilt(spark, queries, live):
    corpus = spark.createDataFrame(
        [(i, v) for i, v in sorted(live.items())], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    return ivf_topk(
        queries, ivf_assign(corpus, CENTS), CENTS, k=K, n_probe=PROBE
    )


def test_maintained_equals_rebuilt_under_churn(spark, tmp_path):
    m = AnnIndexMaintainer(root=str(tmp_path / "ann"), cents=CENTS)
    live = {}
    queries = spark.createDataFrame(
        [(1000 + j, _near(j % CELLS, 900 + j)) for j in range(4)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )

    # victim: a vector sitting right on cell 0's centroid — guaranteed
    # top-k for the cell-0 query until batch 2 deletes it
    victim = _near(0, 1)
    # mover: starts in cell 1, batch 1 re-embeds it into cell 2
    mover_old, mover_new = _near(1, 2), _near(2, 3)
    assert _cell_of(mover_old) != _cell_of(mover_new)

    batches = [
        # b0: initial corpus — victim, mover, and 10 background vectors
        [("i", 0, victim, 0), ("i", 1, mover_old, 1)]
        + [("i", 10 + i, _vec(i), 2 + i) for i in range(10)],
        # b1: UPDATE moves vector 1 across cells; one background update
        [("u", 1, mover_new, 100), ("u", 10, _vec(50), 101)],
        # b2: DELETE the victim; insert a replacement nearby
        [("d", 0, None, 200), ("i", 2, _near(0, 4), 201)],
    ]
    seen_q0 = {}
    for bid, rows in enumerate(batches):
        assert m.process(spark, spark.createDataFrame(rows, SCHEMA), batch_id=bid)
        for op, i, v, _ in rows:
            live.pop(i, None) if op == "d" else live.__setitem__(i, v)
        got = _topk_sets(m.topk(spark, queries, k=K, n_probe=PROBE))
        want = _topk_sets(_rebuilt(spark, queries, live))
        assert got == want, f"divergence after batch {bid}"
        seen_q0[bid] = {nid for q, nid, _ in got if q == 1000}

    # non-vacuity: the victim WAS a neighbor of the cell-0 query before its
    # delete and is gone after; the mover's stored cell actually changed
    assert 0 in seen_q0[0] and 0 in seen_q0[1]
    assert 0 not in seen_q0[2]
    cells = {
        r["vec_id"]: r["cell"] for r in m.index(spark).collect()
    }
    assert cells[1] == _cell_of(mover_new) != _cell_of(mover_old)

    # replay of the last batch is a no-op (batch-id pointer protocol)
    before = _topk_sets(m.topk(spark, queries, k=K, n_probe=PROBE))
    assert not m.process(
        spark, spark.createDataFrame(batches[-1], SCHEMA), batch_id=2
    )
    assert _topk_sets(m.topk(spark, queries, k=K, n_probe=PROBE)) == before

    # cell_stats sees only live vectors (drift monitor reads the fold)
    stats = {r["cell"]: r["n_vectors"] for r in m.cell_stats(spark).collect()}
    assert sum(stats.values()) == len(live)
    assert None not in stats  # tombstones carry null cells and must fold out


def test_ann_ivm_under_structured_streaming(spark, tmp_path):
    """The maintainer wired as a real foreachBatch sink: a file-source
    stream delivers three CDC slices (maxFilesPerTrigger=1); maintained
    top-k must equal the static rebuild over the final live corpus, and a
    fresh query on the same checkpoint must replay as a no-op."""
    import shutil

    slices = [
        [("i", i, _vec(i), 100 + i) for i in range(12)],
        [("u", 3, _near(0, 20), 200), ("i", 12, _near(1, 21), 201)],
        [("d", 5, None, 300), ("d", 11, None, 301)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for n, rows in enumerate(slices):
        d = tmp_path / f"slice{n}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).json(str(d))
        for f in sorted(p.name for p in d.iterdir()):
            if f.endswith(".json"):
                shutil.copy(d / f, src / f"b{n}.json")

    m = AnnIndexMaintainer(root=str(tmp_path / "ann"), cents=CENTS)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: m.process(spark, df, bid)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    live = {i: _vec(i) for i in range(12)}
    live[3] = _near(0, 20)
    live[12] = _near(1, 21)
    del live[5], live[11]
    queries = spark.createDataFrame(
        [(1000 + j, _near(j % CELLS, 950 + j)) for j in range(3)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    got = _topk_sets(m.topk(spark, queries, k=K, n_probe=PROBE))
    assert got == _topk_sets(_rebuilt(spark, queries, live))
    assert got, "streaming ANN IVM returned nothing — vacuous"
    # fresh query on the same checkpoint: replays are no-ops
    run()
    assert _topk_sets(m.topk(spark, queries, k=K, n_probe=PROBE)) == got


def test_in_batch_duplicates_collapse_by_seq(spark, tmp_path):
    """Two ops for the same id in one batch: the higher seq wins (the
    standing precombine rule) — including a delete followed by a
    re-insert."""
    m = AnnIndexMaintainer(root=str(tmp_path / "dup"), cents=CENTS)
    a, b = _near(0, 10), _near(1, 11)
    rows = [("i", 7, a, 0), ("u", 7, b, 1), ("d", 8, None, 2), ("i", 8, a, 3)]
    assert m.process(spark, spark.createDataFrame(rows, SCHEMA), batch_id=0)
    got = {
        (r["vec_id"], r["cell"]) for r in m.index(spark).collect()
    }
    assert got == {(7, _cell_of(b)), (8, _cell_of(a))}


def test_catalog_entry_cdc_script_non_vacuous(spark):
    """The ann_topk_maintained driver entry's CDC script must actually
    exercise the maintenance algebra: (a) at least one re-embedded vector
    MOVED cells, (b) at least one deleted vector was a former top-k
    neighbor of a query (eviction is observable in results), and (c) the
    update-then-delete overlap (vec_id hit by both mods) is non-empty."""
    from pyspark.sql import functions as F

    from kafka_cdc_hudi_spark.operators.similarity import (
        ivf_assign,
        ivf_static_codebook,
        ivf_topk,
    )
    from kafka_cdc_hudi_spark.plans.catalog_streaming import (
        _ANN_IVM_DEL_MOD,
        _ANN_IVM_DEL_RES,
        _ANN_IVM_UPD_MOD,
        _ANN_IVM_UPD_RES,
        _IVF_CELLS,
        _IVF_K,
        _IVF_PROBE,
        EMBEDDING_DIM,
        ann_topk_maintained,
    )
    from kafka_cdc_hudi_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    e = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    vid = F.col("vec_id")

    # (a) some updated vector changes cell under its successor's embedding
    orig = ivf_assign(e, cents).select("vec_id", F.col("cell").alias("old_cell"))
    nxt = e.select((vid - 1).alias("vec_id"), F.col("embedding").alias("next_emb"))
    upd = (
        e.filter(vid % _ANN_IVM_UPD_MOD == _ANN_IVM_UPD_RES)
        .join(nxt, "vec_id", "left")
        .select("vec_id", F.coalesce("next_emb", "embedding").alias("embedding"))
    )
    new = ivf_assign(upd, cents).select("vec_id", F.col("cell").alias("new_cell"))
    moved = new.join(orig, "vec_id").filter(F.col("new_cell") != F.col("old_cell"))
    assert moved.count() > 0, "no re-embedded vector moved cells"

    # (b) some deleted vector sat in the PRE-CHURN top-k of a query
    pre_q = e.filter(vid < 10)
    pre_topk = ivf_topk(pre_q, ivf_assign(e, cents), cents, k=_IVF_K, n_probe=_IVF_PROBE)
    evicted = pre_topk.filter(F.col("nid") % _ANN_IVM_DEL_MOD == _ANN_IVM_DEL_RES)
    assert evicted.count() > 0, "no deleted vector was a former top-k neighbor"
    # and eviction is observable: no deleted id appears in the final results
    final = ann_topk_maintained(spark, sf)
    assert final.filter(F.col("nid") % _ANN_IVM_DEL_MOD == _ANN_IVM_DEL_RES).count() == 0

    # (c) update-then-delete overlap exists in the corpus id range
    both = e.filter(
        (vid % _ANN_IVM_UPD_MOD == _ANN_IVM_UPD_RES)
        & (vid % _ANN_IVM_DEL_MOD == _ANN_IVM_DEL_RES)
    )
    assert both.count() > 0, "update-then-delete edge not exercised"
