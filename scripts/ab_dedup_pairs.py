"""Same-session A/B: pair exchanges carrying embedding ARRAYS vs ids-only
pair exchange + attach-by-join (optimization guide §2.3 "shuffle keys and
metadata instead of payloads" / §8) for the two corpus-bounded pair miners:

- dedup_embedding_cosine: SRP-bucket self-join; current form ships
  (ea, eb) through the pair-dedup exchange AND caches the embedding 8x
  (once per table) in the checkpointed bucket index.
- dedup_semantic_clusters' dup pass: cell self-join; current form ships
  both arrays through the cell join.

Variants are value-checked for exact equality at sf0.01 before timing.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_dedup_pairs.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_cdc_hudi_spark.functions.vectors import cosine  # noqa: E402
from kafka_cdc_hudi_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_train_sql_sample,
    srp_bucketize,
)
from kafka_cdc_hudi_spark.plans.catalog_streaming import semdedup_cells_for  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402

DIM, BITS, TABLES, THRESH = 64, 4, 8, 0.35
TAU = 0.35


def cos_current(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    b = srp_bucketize(e.select("vec_id", "embedding"), DIM, BITS, TABLES).localCheckpoint(
        eager=False
    )
    left = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    right = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        left.join(right, ["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.first("ea").alias("ea"), F.first("eb").alias("eb"))
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= THRESH)
        .select("vec_a", "vec_b", "cosine")
    )


def cos_ids(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    # ids-only bucket index: the checkpoint caches (tbl, sig, vec_id) — not
    # 8 copies of every embedding — and the pair exchange carries two longs
    b = (
        srp_bucketize(e.select("vec_id", "embedding"), DIM, BITS, TABLES)
        .select("tbl", "sig", "vec_id")
        .localCheckpoint(eager=False)
    )
    pairs = (
        b.select("tbl", "sig", F.col("vec_id").alias("vec_a"))
        .join(b.select("tbl", "sig", F.col("vec_id").alias("vec_b")), ["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= THRESH)
        .select("vec_a", "vec_b", "cosine")
    )


def sem_dup_current(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_cells = semdedup_cells_for(e.count())
    cents = ivf_train_sql_sample(e, n_cells=n_cells, iters=5)
    asg = ivf_assign(e, cents).localCheckpoint(eager=False)
    left = asg.select("cell", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    right = asg.select("cell", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        left.join(right, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= TAU)
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("dup_min"))
    )


def sem_dup_ids(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_cells = semdedup_cells_for(e.count())
    cents = ivf_train_sql_sample(e, n_cells=n_cells, iters=5)
    asg = ivf_assign(e, cents).select("cell", "vec_id").localCheckpoint(eager=False)
    pairs = (
        asg.select("cell", F.col("vec_id").alias("vec_a"))
        .join(asg.select("cell", F.col("vec_id").alias("vec_b")), "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= TAU)
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("dup_min"))
    )


TARGETS = {
    "dedup_cos": (cos_current, cos_ids),
    "sem_dup": (sem_dup_current, sem_dup_ids),
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    eq_dir = os.environ.get("SPARK_GRAFT_EQ_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ab_dedup_pairs")
    spark.sparkContext.setLogLevel("ERROR")

    for name, (cur, ids) in TARGETS.items():
        a = sorted(tuple(r) for r in cur(spark, eq_dir).collect())
        b = sorted(tuple(r) for r in ids(spark, eq_dir).collect())
        assert a == b, f"{name}: variant mismatch ({len(a)} vs {len(b)} rows)"
        print(f"# {name}: value-equal on {len(a)} rows at {eq_dir}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name, (cur, ids) in TARGETS.items():
        noop(cur(spark, sf_dir))
        noop(ids(spark, sf_dir))
        cur_t, ids_t = [], []
        for _ in range(n_rounds):
            for fn, acc in ((cur, cur_t), (ids, ids_t)):
                spark.sparkContext.setJobDescription(f"{name}:{fn.__name__}")
                t0 = time.perf_counter()
                noop(fn(spark, sf_dir))
                acc.append(round(time.perf_counter() - t0, 3))
        out[name] = {"current": cur_t, "ids": ids_t,
                     "current_min": min(cur_t), "ids_min": min(ids_t)}
        print(f"# {name}: current {cur_t} ids {ids_t}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "targets": out}))
    spark.stop()


if __name__ == "__main__":
    main()
