"""Same-session A/B: fused one-agg hash embedding (r14 commit 5fc6535) vs
the pre-change two-step (bucket pre-agg + map_from_entries rebuild) — a
regression check for pipeline_rag_index, which read 2.16/2.33/2.47 s in ALL
THREE opt sweeps vs 1.33 s at build (consistent, unlike the ambient bursts).

Patches plans.catalog_text._hash_embed_df so both variants execute the exact
entry code paths (pipeline_rag_index + text_hash_embedding).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/ab_hash_embed.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.plans import catalog_text as ct  # noqa: E402
from kafka_cdc_hudi_spark.functions.textfns import tokens  # noqa: E402

_DIM = ct._HASHEMB_DIM
_new_embed = ct._hash_embed_df


def _old_embed(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """Verbatim pre-5fc6535 form: (ids, bucket) pre-agg then per-id
    map_from_entries + element_at rebuild (2 exchanges)."""
    tok = df.select(*id_cols, F.explode(tokens(text_col)).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("token"), F.lit("|emb_v1"))), 1, 15), 16, 10)
        .cast("bigint") % _DIM
    )
    sign = 1 - 2 * (
        F.conv(F.substring(F.md5(F.concat(F.col("token"), F.lit("|sign_v1"))), 1, 15), 16, 10)
        .cast("bigint") % 2
    )
    cells = (
        tok.select(*id_cols, bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(*id_cols, "bucket")
        .agg(F.sum("sign").alias("s"))
    )
    return (
        cells.groupBy(*id_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("s")))
            ).alias("m")
        )
        .select(
            *id_cols,
            F.expr(
                f"transform(sequence(0, {_DIM - 1}),"
                " j -> coalesce(element_at(m, CAST(j AS BIGINT)), CAST(0 AS BIGINT)))"
            ).alias("embedding"),
        )
        .withColumn(
            "l2_sq",
            F.expr("aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ab_hash_embed")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    variants = {"old": _old_embed, "new": _new_embed}
    targets = {
        "rag": lambda: ct.pipeline_rag_index(spark, sf_dir),
        "docs": lambda: ct.text_hash_embedding(spark, sf_dir),
    }
    out: dict[str, list] = {f"{t}:{v}": [] for t in targets for v in variants}
    # warm every combination once
    for v, fn in variants.items():
        ct._hash_embed_df = fn
        for t, mk in targets.items():
            noop(mk())
    for _ in range(n_rounds):
        for v, fn in variants.items():
            ct._hash_embed_df = fn
            for t, mk in targets.items():
                sc.setJobDescription(f"embed:{t}:{v}")
                t0 = time.perf_counter()
                noop(mk())
                out[f"{t}:{v}"].append(round(time.perf_counter() - t0, 3))
    ct._hash_embed_df = _new_embed
    for k, ts in sorted(out.items()):
        print(f"# {k}: {ts} min {min(ts)}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
