"""Per-file column-stats index (pointer ``file_stats``) + range-clustered
base layout: the Hudi column-stats-index / Delta file-skipping analog.

Correctness bar: stats-pruned point lookups must return exactly what a
full-scan lookup returns, on every layout (range-clustered, hash, MOR),
and the I/O reduction must be REAL — pinned via ``inputFiles()`` like the
bucketed-lookup test.
"""

import json
import os

import pytest

from kafka_cdc_hudi_spark.sinks.keyed_table import (
    KeyedParquetTable,
    MODE_COW,
    MODE_MOR,
)

SCHEMA = "id long, mtime long, _deleted boolean, val string"


def rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def ranged(tmp_path):
    return KeyedParquetTable(
        str(tmp_path / "ranged"),
        keys=["id"],
        order_col="mtime",
        cluster_cols=["id"],
        cluster_range_files=8,  # pinned file count (AQE would coalesce 2000 tiny rows to 1)
    )


def test_range_layout_stats_prune_lookups(spark, ranged):
    t = ranged
    base = [(i, 10, False, f"a{i}") for i in range(2000)]
    assert t.merge_batch(spark, rows_df(spark, base), batch_id=0)

    p = t._read_pointer()
    stats = p["file_stats"][str(p["version"])]
    files = {n for n in os.listdir(t._version_dir(p["version"])) if n.endswith(".parquet")}
    assert set(stats) == files and len(files) > 1
    # range layout: per-file id ranges are disjoint
    ranges = sorted(tuple(s["id"]) for s in stats.values())
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2

    got = {(r["id"], r["val"]) for r in t.read_keys(spark, [(5,), (1995,)]).collect()}
    assert got == {(5, "a5"), (1995, "a1995")}
    # the pruned plan reads strictly fewer files than the snapshot holds
    lookup_files = set(t.read_keys(spark, [(5,)]).inputFiles())
    all_files = set(t.read(spark).inputFiles())
    assert lookup_files and lookup_files < all_files
    # no file can contain the key -> schema-only empty frame
    assert t.read_keys(spark, [(5000,)]).count() == 0
    assert t.read_keys(spark, [(5000,)]).inputFiles() == []


def test_stats_follow_updates_and_retention(spark, ranged):
    t = ranged
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(100)]), batch_id=0)
    for bid in range(1, 5):  # push past keep_versions=3
        t.merge_batch(
            spark,
            rows_df(spark, [(i, 10 + bid, False, f"b{bid}_{i}") for i in range(0, 100, 7)]),
            batch_id=bid,
        )
    p = t._read_pointer()
    # the index never references pruned versions, and covers the current one
    assert set(p["file_stats"]) <= set(p["commits"])
    assert str(p["version"]) in p["file_stats"]
    got = {r["val"] for r in t.read_keys(spark, [(7,)]).collect()}
    assert got == {"b4_7"}


def test_hash_layout_lookup_still_correct(spark, tmp_path):
    # no clustering: files span the key domain, the index can't prune,
    # but lookups must stay correct (degrades to full scan)
    t = KeyedParquetTable(str(tmp_path / "hash"), keys=["id"], order_col="mtime")
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(50)]), batch_id=0)
    got = {(r["id"], r["val"]) for r in t.read_keys(spark, [(3,), (44,)]).collect()}
    assert got == {(3, "a3"), (44, "a44")}


def test_corrupt_index_falls_back_to_full_scan(spark, ranged):
    t = ranged
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(200)]), batch_id=0)
    with open(t._pointer_path) as f:
        p = json.load(f)
    del p["file_stats"]
    with open(t._pointer_path, "w") as f:
        json.dump(p, f)
    got = {r["val"] for r in t.read_keys(spark, [(7,)]).collect()}
    assert got == {"a7"}


def test_mor_lookups_fold_pending_deltas(spark, tmp_path):
    # MOR must NOT take the stats-pruned path: a pending delta can update
    # any key, so lookups go through the folded read
    t = KeyedParquetTable(
        str(tmp_path / "mor"), keys=["id"], order_col="mtime", mode=MODE_MOR,
        cluster_cols=["id"], cluster_range_files=True,
    )
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(50)]), batch_id=0)
    t.compact(spark)  # base with stats
    t.merge_batch(spark, rows_df(spark, [(7, 20, False, "updated")]), batch_id=1)
    got = {r["val"] for r in t.read_keys(spark, [(7,)]).collect()}
    assert got == {"updated"}


def test_read_range_prunes_files(spark, ranged):
    t = ranged
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(2000)]), batch_id=0)
    sl = t.read_range(spark, "id", 100, 120)
    assert {r["id"] for r in sl.collect()} == set(range(100, 121))
    assert set(sl.inputFiles()) < set(t.read(spark).inputFiles())
    # fully out-of-range slice: schema-only empty frame
    assert t.read_range(spark, "id", 10_000, 10_100).count() == 0
    # MOR fallback folds deltas and still answers correctly
    mor = KeyedParquetTable(
        str(t.root) + "_m", keys=["id"], order_col="mtime", mode=MODE_MOR
    )
    mor.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(50)]), batch_id=0)
    mor.merge_batch(spark, rows_df(spark, [(7, 20, False, "upd")]), batch_id=1)
    assert {r["val"] for r in mor.read_range(spark, "id", 6, 8).collect()} == {"a6", "upd", "a8"}


def test_zorder_range_layout_skips_in_both_dimensions(spark, tmp_path):
    # Z-order + range files: Morton-range partitioning keeps files local in
    # EVERY clustered dimension at once, so the per-column stats index
    # prunes a slice on either dimension — the property that justifies
    # z-order over a linear (a, b) sort, where a b-slice touches all files
    t = KeyedParquetTable(
        str(tmp_path / "z"), keys=["id"], order_col="mtime",
        cluster_cols=["a", "b"], cluster_zorder=True, cluster_range_files=8,
    )
    rows = [(i, 10, False, (i * 37) % 512, (i * 53) % 512) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, mtime long, _deleted boolean, a long, b long")
    assert t.merge_batch(spark, df, batch_id=0)
    all_files = set(t.read(spark).inputFiles())
    assert len(all_files) == 8
    for col in ("a", "b"):
        sl = t.read_range(spark, col, 0, 63)
        assert {r[col] for r in sl.collect()} == set(range(0, 64))
        assert set(sl.inputFiles()) < all_files, f"no file skipped on {col}"


def test_commit_meta_records_operations(spark, tmp_path):
    # Hudi commit-metadata parity: every pointer commit carries op kind,
    # files, bytes, wall time — and retention trims it with the commits
    cow = KeyedParquetTable(str(tmp_path / "c"), keys=["id"], order_col="mtime")
    for bid in range(5):  # past keep_versions=3
        cow.merge_batch(
            spark, rows_df(spark, [(i, 10 + bid, False, f"v{bid}_{i}") for i in range(20)]),
            batch_id=bid,
        )
    meta = cow.commit_meta()
    p = cow._read_pointer()
    assert set(map(str, meta)) <= set(p["commits"]) and meta
    for m in meta.values():
        assert m["op"] == "upsert" and m["files"] >= 1 and m["bytes"] > 0 and m["wall_ms"] >= 0

    mor = KeyedParquetTable(str(tmp_path / "m"), keys=["id"], order_col="mtime", mode=MODE_MOR)
    mor.merge_batch(spark, rows_df(spark, [(1, 10, False, "a")]), batch_id=0)
    mor.merge_batch(spark, rows_df(spark, [(2, 10, False, "b")]), batch_id=1)
    assert {m["op"] for m in mor.commit_meta().values()} == {"delta"}
    mor.compact(spark)
    # folded deltas leave the commit map, so their metadata is trimmed too
    assert {m["op"] for m in mor.commit_meta().values()} == {"compact"}


def test_parquet_bloom_keys_written_and_reads_correct(spark, tmp_path):
    # can't introspect bloom offsets through pyarrow/duckdb here, so pin
    # the observable contract: identical data writes BIGGER files with the
    # option on (the bloom bitmaps are real bytes), and reads/lookups are
    # unchanged
    rows = [(i, 10, False, f"a{i}") for i in range(5000)]
    plain = KeyedParquetTable(str(tmp_path / "p"), keys=["id"], order_col="mtime")
    bloom = KeyedParquetTable(
        str(tmp_path / "b"), keys=["id"], order_col="mtime", parquet_bloom_keys=True
    )
    plain.merge_batch(spark, rows_df(spark, rows), batch_id=0)
    bloom.merge_batch(spark, rows_df(spark, rows), batch_id=0)

    def _bytes(t):
        v = t._read_pointer()["version"]
        d = t._version_dir(v)
        return sum(
            os.path.getsize(os.path.join(d, n))
            for n in os.listdir(d)
            if n.endswith(".parquet")
        )

    assert _bytes(bloom) > _bytes(plain)
    got = {(r["id"], r["val"]) for r in bloom.read_keys(spark, [(7,), (4999,)]).collect()}
    assert got == {(7, "a7"), (4999, "a4999")}


def test_restore_and_compact_record_stats(spark, ranged):
    t = ranged
    t.merge_batch(spark, rows_df(spark, [(i, 10, False, f"a{i}") for i in range(100)]), batch_id=0)
    v1 = t._read_pointer()["version"]
    t.merge_batch(spark, rows_df(spark, [(5, 20, False, "new5")]), batch_id=1)
    rv = t.restore(spark, version=v1)
    p = t._read_pointer()
    assert str(rv) in p["file_stats"]
    assert {r["val"] for r in t.read_keys(spark, [(5,)]).collect()} == {"a5"}
