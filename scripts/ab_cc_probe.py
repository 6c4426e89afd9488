"""Same-session A/B: star-CC with lazy checkpoints + fused probe (r14
commit e920760) vs the pre-change eager checkpoints + two limit-counts —
regression check for the SWEEP_r14_opt{,2} dedup_corpus_final readings
(the entry sat inside both runs' ambient bursts; this isolates it).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/ab_cc_probe.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402


def cc_star_eager(edges: DataFrame, src: str, dst: str, max_iter: int = 40) -> DataFrame:
    """The pre-e920760 form: eager per-round checkpoints, two limit-counts."""
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def sym(c: DataFrame) -> DataFrame:
        return c.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            c.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    for _ in range(max_iter):
        s = sym(canon)
        mins_all = s.groupBy("u").agg(F.min("v").alias("mn"))
        ls = (
            s.filter(F.col("v") > F.col("u"))
            .join(mins_all, "u")
            .select(F.least(F.col("mn"), F.col("u")).alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        s2 = sym(ls)
        below = s2.filter(F.col("v") < F.col("u"))
        mins_b = below.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            below.join(mins_b, "u")
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionByName(mins_b.select(F.col("m").alias("a"), F.col("u").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            ss.exceptAll(canon).limit(1).count() + canon.exceptAll(ss).limit(1).count()
        )
        canon = ss
        if changed == 0:
            members = canon.select(F.col("b").alias("node"), F.col("a").alias("component"))
            roots = all_nodes.join(
                canon.select(F.col("b").alias("node")), "node", "left_anti"
            ).withColumn("component", F.col("node"))
            return members.unionByName(roots)
    raise RuntimeError("did not converge")


def corpus_final(spark, sf_dir, variant: str) -> DataFrame:
    from kafka_cdc_hudi_spark.operators.graph import connected_components_star
    from kafka_cdc_hudi_spark.plans.catalog_text import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc_fn = cc_star_eager if variant == "eager" else connected_components_star
    cc = cc_fn(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    kept = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        kept.join(sizes, "cluster_id")
        .join(d, "doc_id")
        .select("doc_id", "n_members", "lang", "n_chars")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ab_cc_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict[str, list] = {"eager": [], "lazy": []}
    jobs: dict[str, list] = {"eager": [], "lazy": []}
    tracker = sc.statusTracker()
    # warm both once
    noop(corpus_final(spark, sf_dir, "eager"))
    noop(corpus_final(spark, sf_dir, "lazy"))
    for _ in range(n_rounds):
        for variant in ("eager", "lazy"):
            sc.setJobDescription(f"cc:{variant}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            noop(corpus_final(spark, sf_dir, variant))
            out[variant].append(round(time.perf_counter() - t0, 3))
    for v, ts in out.items():
        print(f"# {v}: {ts} min {min(ts)}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
