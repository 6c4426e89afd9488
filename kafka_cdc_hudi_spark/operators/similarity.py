"""Approximate-nearest-neighbor scale paths over embedding columns.

``ann_topk_bruteforce`` (plans/catalog_text.py) is the exact baseline:
O(Q x N) cosine scans. These operators are the sublinear-work variants for
large N — both keep the winning shape at 100 TB: build a compact index
side, broadcast it, and turn all-pairs into an equi-join on bucket keys.

- ``srp_bucketize``: sign-random-projection LSH — L hash tables of b-bit
  signatures from deterministic md5-seeded hyperplanes. Recall is tunable
  via (b, L); candidates are rows sharing any table's signature.
- ``ivf_assign`` / ``ivf_topk``: IVF coarse quantization — kmeans-lite
  centroids (seeded, few iterations, driver-side on a sample), probe the
  ``n_probe`` nearest cells only.

Both are verified against the brute-force baseline by recall@k in tests
(not by the DuckDB oracle: the driver records the weaker rows-only check
for these, which is expected for approximate operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.vectors import cosine


def _srp_planes(dim: int, n_bits: int, table: int, seed: str = "srp") -> np.ndarray:
    """Deterministic hyperplanes: md5(seed|table|bit|dim-chunk) -> uniform
    in [-1, 1). Reproducible across sessions with no RNG state."""
    planes = np.empty((n_bits, dim), dtype=np.float64)
    for b in range(n_bits):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}|{table}|{b}|{i}".encode()).digest()
            for off in range(0, 16, 4):
                vals.append(int.from_bytes(h[off : off + 4], "big") / 2**31 - 1.0)
            i += 1
        planes[b] = vals[:dim]
    return planes


def srp_signature_col(dim: int, n_bits: int, table: int, col: str = "embedding") -> F.Column:
    """Signature as a native expression: sign bits of plane dot-products,
    packed into a long. All JVM-side — the planes are literal arrays."""
    planes = _srp_planes(dim, n_bits, table)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(*[F.lit(float(v)) for v in planes[b]])
        d = F.aggregate(
            F.zip_with(F.col(col), plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def srp_bucketize(
    df: DataFrame, dim: int, n_bits: int = 12, n_tables: int = 4, col: str = "embedding"
) -> DataFrame:
    """Add (table, signature) bucket rows: one output row per input row per
    table. Downstream: equi-join on (table, sig) for candidates.

    All n_tables signatures are computed in ONE projection and fanned out
    with a single explode — a per-table union would recompute the upstream
    lineage once per table (the same anti-pattern the MinHash bands fix)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                srp_signature_col(dim, n_bits, t, col).alias("sig"),
            )
            for t in range(n_tables)
        ]
    )
    return (
        df.withColumn("__e", F.explode(entries))
        .withColumn("tbl", F.col("__e.tbl"))
        .withColumn("sig", F.col("__e.sig"))
        .drop("__e")
    )


def srp_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed top-k: exact cosine only on bucket-colliding pairs."""
    qb = srp_bucketize(
        queries.select(F.col(id_col).alias("qid"), F.col(col).alias("qe")),
        dim, n_bits, n_tables, "qe",
    )
    cb = srp_bucketize(candidates, dim, n_bits, n_tables, col)
    cand = (
        qb.join(cb, ["tbl", "sig"])
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", "qe", id_col, col)
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine(F.col("qe"), F.col(col)))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col(id_col).alias("nid"), "cosine", "rank")
    )


# -- IVF ----------------------------------------------------------------------


def ivf_static_codebook(dim: int, n_cells: int = 8, seed: str = "ivf") -> np.ndarray:
    """Deterministic unit-norm codebook from the seeded md5 generator (same
    construction as the SRP hyperplanes). This is the QUERY-TIME contract of
    IVF at scale: the codebook is a build artifact loaded by every executor
    and every query — queries never retrain it — so the catalog entry built
    on this is exactly reproducible in SQL (centroids as literals), while
    data-adapted training (:func:`ivf_train_centroids`) remains the offline
    index-build path with recall-floor coverage in tests/test_similarity.py."""
    cents = _srp_planes(dim, n_cells, table=0, seed=seed)
    return cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)


def kmeans_lite(x: np.ndarray, n_cells: int, iters: int) -> np.ndarray:
    """The shared numpy kmeans core: deterministic stride init, cosine
    assignment, mean update, unit-norm output. Bit-identical given the same
    float64 input rows in the same order — which is what lets the trained
    IVF catalog entry carry a FULL SQL oracle (the oracle builder reruns
    THIS function on the same rows read via DuckDB and emits the resulting
    centroids as literals)."""
    n_cells = min(n_cells, len(x))
    cents = x[:: max(1, len(x) // n_cells)][:n_cells].copy()
    for _ in range(iters):
        sims = x @ cents.T / (
            np.linalg.norm(x, axis=1, keepdims=True) * np.linalg.norm(cents, axis=1) + 1e-12
        )
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    # unit-norm: downstream ivf_assign argmaxes a raw dot, and with unit
    # centroids that IS the cosine argmax (no large-norm bias)
    return cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)


#: deterministic SQL-expressible training sample: vec_id % MOD == 0 AND
#: vec_id < BOUND. Bounds the driver collect to BOUND/MOD rows regardless of
#: corpus size, prunes at the scan (plain comparisons push down), and is
#: trivially reproducible in any SQL engine — unlike xxhash64 sampling.
TRAIN_SAMPLE_MOD, TRAIN_SAMPLE_BOUND = 4, 8192


def ivf_train_sql_sample(
    df: DataFrame, n_cells: int = 8, iters: int = 5, id_col: str = "vec_id", col: str = "embedding"
) -> np.ndarray:
    """Train kmeans-lite on the deterministic SQL-expressible sample. The
    collect is hard-bounded at TRAIN_SAMPLE_BOUND/TRAIN_SAMPLE_MOD = 2048
    rows; ordering is pinned by the driver-side sort on ``id_col``."""
    pdf = (
        df.filter(
            (F.col(id_col) % TRAIN_SAMPLE_MOD == 0)
            & (F.col(id_col) < TRAIN_SAMPLE_BOUND)
        )
        .select(id_col, col)
        .toPandas()
        .sort_values(id_col)
    )
    x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[col]])
    return kmeans_lite(x, n_cells, iters)


def ivf_train_centroids(
    df: DataFrame, dim: int, n_cells: int = 16, iters: int = 5, sample: int = 2048, col: str = "embedding"
) -> np.ndarray:
    """Driver-side kmeans-lite on a deterministic sample. At 100 TB you
    train once on a sample and broadcast — the index build must not scan
    (let alone globally SORT) the full corpus, so the sample is taken with
    a deterministic hash filter: ``xxhash64(id) % 4 == 0`` spreads the
    picks across the corpus, ``limit`` caps the scan (CollectLimit stops
    consuming partitions once satisfied), and the driver-side sort of the
    ≤``sample`` collected ids pins the kmeans init order."""
    id_col = df.columns[0]
    pdf = (
        df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(4)) == 0)
        .limit(sample)
        .select(id_col, col)
        .toPandas()
    )
    if len(pdf) < n_cells:  # tiny corpus: the 1-in-4 filter left too few
        pdf = df.limit(sample).select(id_col, col).toPandas()
    rows = pdf.sort_values(id_col)[col].tolist()
    x = np.array([np.asarray(v, dtype=np.float64) for v in rows])
    return kmeans_lite(x, n_cells, iters)


def _centroid_sim_cols(cents: np.ndarray, col: str) -> list[F.Column]:
    sims = []
    for ci, cvec in enumerate(cents):
        plane = F.array(*[F.lit(float(v)) for v in cvec])
        d = F.aggregate(
            F.zip_with(F.col(col), plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sims.append(d.alias(f"c{ci}"))
    return sims


def ivf_assign_pandas(df: DataFrame, cents: np.ndarray, col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid cell — vectorized Pandas
    UDF path (one numpy matmul per Arrow batch, centroids broadcast to the
    workers).

    This is the scale path for LARGE codebooks: the native-expression
    variant (:func:`ivf_assign`) compiles n_cells aggregate expressions,
    which is ideal for tens of cells but blows up codegen at hundreds+;
    a (batch x dim) @ (dim x n_cells) matmul is flat in n_cells. Computes
    the same raw-dot argmax as the native variant (same doubles, same
    first-wins tie behavior), so assignments are identical.
    """
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        # null embeddings -> null cell (the native variant's behavior);
        # np.array over a batch mixing vectors and None would raise
        out = pd.array([None] * len(emb), dtype="Int32")
        valid = [i for i, v in enumerate(emb) if v is not None]
        if valid:
            x = np.array([np.asarray(emb.iloc[i], dtype=np.float64) for i in valid])
            cells = (x @ bc.value.T).argmax(axis=1)
            for j, i in enumerate(valid):
                out[i] = int(cells[j])
        return pd.Series(out, dtype="Int32")

    return df.withColumn("cell", assign(F.col(col)))


def ivf_assign(df: DataFrame, cents: np.ndarray, col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid cell (argmax dot).
    Native expressions; centroids are broadcast literals."""
    sims = _centroid_sim_cols(cents, col)
    with_sims = df.select("*", *sims)
    cell = F.expr(
        f"array_position(array({','.join(f'c{i}' for i in range(len(cents)))}), "
        f"array_max(array({','.join(f'c{i}' for i in range(len(cents)))}))) - 1"
    )
    return with_sims.withColumn("cell", cell.cast("int")).drop(
        *[f"c{i}" for i in range(len(cents))]
    )


def ivf_topk(
    queries: DataFrame,
    candidates_assigned: DataFrame,
    cents: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe best cells per query, exact cosine within them."""
    n_cells = len(cents)
    q = queries.select(F.col(id_col).alias("qid"), F.col(col).alias("qe"))
    q = q.select("*", *_centroid_sim_cols(cents, "qe"))
    sim_arr = F.array(*[F.col(f"c{i}") for i in range(n_cells)])
    # indices of top n_probe centroid sims
    probe = F.slice(
        F.expr(
            "transform(array_sort(zip_with(sequence(0,{n}),array({cols}),(i,s)->struct(s as s,i as i)),"
            "(l,r) -> case when l.s > r.s then -1 when l.s < r.s then 1 "
            "when l.i < r.i then -1 else 1 end), x -> x.i)".format(
                n=n_cells - 1, cols=",".join(f"c{i}" for i in range(n_cells))
            )
        ),
        1,
        n_probe,
    )
    q = q.withColumn("probe_cells", probe).drop(*[f"c{i}" for i in range(n_cells)])
    qx = q.select("qid", "qe", F.explode("probe_cells").alias("cell"))
    cand = qx.join(candidates_assigned, "cell").filter(F.col("qid") != F.col(id_col))
    scored = cand.withColumn("cosine", cosine(F.col("qe"), F.col(col)))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col(id_col).alias("nid"), "cosine", "rank")
    )
