"""Z-order clustering: Morton-key correctness vs a Python reference,
the multi-dimensional locality property that justifies it, and the
bucketed-sink integration."""

import pytest
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.zorder import zorder_key
from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable


def _morton_py(cells, bits):
    key = 0
    n = len(cells)
    for i in range(bits):
        for j, c in enumerate(cells):
            key |= ((c >> i) & 1) << (i * n + j)
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(i, (i * 37) % 100, (i * 53) % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key([("a", 0, 99), ("b", 0, 999)], bits=8).alias("z")
        ).collect()
    }
    for i, a, b in rows:
        cell_a = min(255, int(a / 99 * 256))
        cell_b = min(255, int(b / 999 * 256))
        assert got[i] == _morton_py([cell_a, cell_b], 8), (i, a, b)


def test_zorder_key_null_and_bounds_clamp(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, -100.0, 2000.0)], "id long, a double, b double"
    )
    out = df.select(zorder_key([("a", 0, 99), ("b", 0, 999)]).alias("z")).collect()
    assert all(r["z"] is not None and r["z"] >= 0 for r in out)


def test_zorder_rejects_bad_config(spark):
    with pytest.raises(ValueError):
        zorder_key([("a", 0, 1)])
    with pytest.raises(ValueError):
        zorder_key([("a", 0, 1), ("b", 0, 1), ("c", 0, 1), ("d", 0, 1)], bits=16)
    with pytest.raises(ValueError):
        KeyedParquetTable(
            "/tmp/x", keys=["id"], mode="cow-bucketed",
            cluster_cols=("a",), cluster_zorder=True,
        )


def test_zorder_blocks_are_local_in_both_dims(spark):
    """The property that buys file skipping: consecutive blocks of the
    z-sorted sequence (stand-ins for row groups) span a small fraction of
    EVERY dimension, where a linear sort leaves the secondary dimension
    spanning ~its full range in every block."""
    n, block = 4096, 64
    df = spark.createDataFrame(
        [(i, (i * 2654435761) % n, (i * 40503) % n) for i in range(n)],
        "id long, x long, y long",
    )

    def avg_spans(order_col):
        rows = df.orderBy(order_col, "id").select("x", "y").collect()
        spans_x, spans_y = [], []
        for s in range(0, n, block):
            blk = rows[s : s + block]
            spans_x.append(max(r["x"] for r in blk) - min(r["x"] for r in blk))
            spans_y.append(max(r["y"] for r in blk) - min(r["y"] for r in blk))
        return sum(spans_x) / len(spans_x) / n, sum(spans_y) / len(spans_y) / n

    zx, zy = avg_spans(zorder_key([("x", 0, n - 1), ("y", 0, n - 1)]))
    lx, ly = avg_spans(F.col("x"))
    # linear: primary dimension tight, secondary spans ~everything
    assert lx < 0.05 and ly > 0.8
    # z-order: BOTH dimensions bounded well below the secondary's linear span
    assert zx < 0.35 and zy < 0.35, (zx, zy)


def test_bucketed_sink_zorder_roundtrip(spark, tmp_path):
    t = KeyedParquetTable(
        str(tmp_path / "z"),
        keys=["id"],
        order_col="mtime",
        mode="cow-bucketed",
        n_buckets=4,
        cluster_cols=("mtime", "metric"),
        cluster_zorder=True,
    )
    rows = [(i, (i * 7) % 100, False, float((i * 13) % 50)) for i in range(300)]
    b = spark.createDataFrame(rows, "id long, mtime long, _deleted boolean, metric double")
    assert t.merge_batch(spark, b, batch_id=0)
    got = {(r["id"], r["mtime"], r["metric"]) for r in t.read(spark).collect()}
    assert got == {(i, m, v) for i, m, _, v in rows}
    # a second commit (partial rewrite) and a compaction both keep state
    b2 = spark.createDataFrame(
        [(1, 200, False, 9.0), (300, 200, False, 1.0)],
        "id long, mtime long, _deleted boolean, metric double",
    )
    assert t.merge_batch(spark, b2, batch_id=1)
    assert t.compact(spark) is not None
    got = {(r["id"], r["mtime"]) for r in t.read(spark).collect()}
    assert (1, 200) in got and (300, 200) in got and len(got) == 301


def test_zorder_parquet_row_group_stats_prune_both_dims(spark, tmp_path):
    """Ties the locality claim to the ACTUAL pruning mechanism: write
    z-sorted vs linearly-sorted parquet with small row groups and read the
    row-group min/max statistics back with pyarrow — z-order must bound
    the span of BOTH dimensions per row group, linear only the first."""
    pq = pytest.importorskip("pyarrow.parquet")
    n = 1 << 16  # ~28 row groups at 64 KiB blocks — enough z-grid granularity
    df = spark.createDataFrame(
        [(i, (i * 2654435761) % n, (i * 40503) % n) for i in range(n)],
        "id long, x long, y long",
    )

    def rg_spans(sorted_df, path):
        (
            sorted_df.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.block.size", 64 * 1024)
            .parquet(path)
        )
        import glob

        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.row_group(0).column(ci).path_in_schema: ci
                for ci in range(md.row_group(0).num_columns)
            }
            for ri in range(md.num_row_groups):
                rg = md.row_group(ri)
                sx = rg.column(cols["x"]).statistics
                sy = rg.column(cols["y"]).statistics
                spans.append(((sx.max - sx.min) / n, (sy.max - sy.min) / n))
        return spans

    z = rg_spans(
        df.orderBy(zorder_key([("x", 0, n - 1), ("y", 0, n - 1)]), "id"),
        str(tmp_path / "z"),
    )
    lin = rg_spans(df.orderBy("x", "id"), str(tmp_path / "lin"))
    assert len(z) > 4 and len(lin) > 4  # small block size -> many row groups
    z_x = sum(s[0] for s in z) / len(z)
    z_y = sum(s[1] for s in z) / len(z)
    lin_x = sum(s[0] for s in lin) / len(lin)
    lin_y = sum(s[1] for s in lin) / len(lin)
    # linear: x-span ~1/n_groups, y useless. z-order: BOTH dims bounded
    # (~1/sqrt(n_groups) each), far below linear's y
    assert lin_x < 0.1 and lin_y > 0.8
    assert z_x < 0.45 and z_y < 0.45, (z_x, z_y)
    assert z_y < lin_y / 2


def test_cow_and_mor_bases_are_clustered(spark, tmp_path):
    """Plain-layout clustering: COW base commits and MOR compacted bases
    sort rows by cluster_cols within each output file, so their row-group
    stats prune (the _ro read path scans exactly these files)."""
    import glob

    import pyarrow.parquet as pq

    for mode in ("cow", "mor"):
        t = KeyedParquetTable(
            str(tmp_path / f"c-{mode}"), keys=["id"], order_col="mtime",
            mode=mode, cluster_cols=("metric",),
        )
        rows = [(i, 10, False, float((i * 7919) % 1000)) for i in range(2000)]
        b = spark.createDataFrame(rows, "id long, mtime long, _deleted boolean, metric double")
        assert t.merge_batch(spark, b, batch_id=0)
        if mode == "mor":
            assert t.compact(spark) is not None
        p = t._read_pointer()
        vdir = t._version_dir(p["version"])
        files = glob.glob(f"{vdir}/*.parquet")
        assert files
        for f in files:
            vals = pq.read_table(f, columns=["metric"])["metric"].to_pylist()
            assert vals == sorted(vals), f"{mode}: {f} not clustered"
        # state unchanged by the sort
        got = {(r["id"], r["metric"]) for r in t.read(spark).collect()}
        assert got == {(i, m) for i, _, _, m in rows}
