"""Same-session A/B of the per-pair Arrow scoring kernels vs the
relational higher-order folds (optimization guide §1.1/§4.2; the r14
lesson that cross-session A/Bs lie about shallow-warm effects).

For each target the fold and kernel variants are built as sibling
DataFrames and noop-timed ALTERNATELY (A/B/A/B...) in one warm session,
plus an exact value-equality check at the oracle SF.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_pair_kernel.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_cdc_hudi_spark.functions.vectors import cosine, dot, l2_norm  # noqa: E402
from kafka_cdc_hudi_spark.operators.similarity import (  # noqa: E402
    _pair_cosine_udf,
    _pair_dot_udf,
    ivf_assign_arrow,
    ivf_static_codebook,
    ivf_topk,
    srp_bucketize,
    srp_topk,
)
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402

DIM = 64
IVF_CELLS, IVF_PROBE, IVF_K = 8, 3, 10


def build_ivf(spark, sf_dir, arrow: bool):
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_static_codebook(DIM, IVF_CELLS)
    assigned = ivf_assign_arrow(e, cents)
    q = e.filter(F.col("vec_id") < 10)
    pd_ = _pair_dot_udf(DIM) if arrow else None
    return ivf_topk(q, assigned, cents, k=IVF_K, n_probe=IVF_PROBE, pair_dot=pd_)


def build_brute(spark, sf_dir, arrow: bool):
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(spark.sparkContext.defaultParallelism)
    e = e.withColumn("_n", l2_norm("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("_n").alias("_qn"),
    )
    dot_fn = _pair_dot_udf(DIM) if arrow else dot
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).withColumn(
        "cosine", dot_fn(F.col("qe"), F.col("embedding")) / (F.col("_qn") * F.col("_n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", F.col("vec_id").alias("nid"), "cosine", "rank")
    )


def build_srp(spark, sf_dir, arrow: bool):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    pc = _pair_cosine_udf(DIM) if arrow else None
    return srp_topk(q, e, DIM, k=10, n_bits=4, n_tables=8, pair_cosine=pc)


def build_dedup_cos(spark, sf_dir, arrow: bool):
    e = load_table(spark, sf_dir, "embeddings")
    b = srp_bucketize(e.select("vec_id", "embedding"), DIM, 4, 8).localCheckpoint(
        eager=False
    )
    left = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    right = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    cos_fn = _pair_cosine_udf(DIM) if arrow else cosine
    return (
        left.join(right, ["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.first("ea").alias("ea"), F.first("eb").alias("eb"))
        .withColumn("cosine", cos_fn(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


TARGETS = {
    "ivf_topk": build_ivf,
    "brute": build_brute,
    "srp_topk": build_srp,
    "dedup_cos": build_dedup_cos,
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    eq_dir = os.environ.get("SPARK_GRAFT_EQ_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ab_pair_kernel")
    spark.sparkContext.setLogLevel("ERROR")

    # exact value equality at the oracle SF (bit-identity: sorted rows equal)
    for name, build in TARGETS.items():
        a = build(spark, eq_dir, False).collect()
        b = build(spark, eq_dir, True).collect()
        ka = sorted(tuple(r) for r in a)
        kb = sorted(tuple(r) for r in b)
        assert ka == kb, f"{name}: variant mismatch ({len(ka)} vs {len(kb)} rows)"
        print(f"# {name}: value-equal on {len(ka)} rows at {eq_dir}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name, build in TARGETS.items():
        # warm both variants once before timing
        noop(build(spark, sf_dir, False))
        noop(build(spark, sf_dir, True))
        fold_t, arrow_t = [], []
        for _ in range(n_rounds):
            for arrow, acc in ((False, fold_t), (True, arrow_t)):
                spark.sparkContext.setJobDescription(
                    f"{name}:{'arrow' if arrow else 'fold'}"
                )
                t0 = time.perf_counter()
                noop(build(spark, sf_dir, arrow))
                acc.append(round(time.perf_counter() - t0, 3))
        out[name] = {"fold": fold_t, "arrow": arrow_t,
                     "fold_min": min(fold_t), "arrow_min": min(arrow_t)}
        print(f"# {name}: fold {fold_t} arrow {arrow_t}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "targets": out}))
    spark.stop()


if __name__ == "__main__":
    main()
