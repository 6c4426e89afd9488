"""One-off evidence for VERDICT r13 item 5: pipeline_warc_corpus dedup
shuffle bytes, full-text window key (the r13 shape) vs md5-hash
aggregate key (the r14 shape), at a given scale dir.

Usage: python scripts/measure_warc_shuffle.py OUT.json [SF_DIR]

Reads per-stage shuffle write bytes from the Spark UI REST API, so the
number is the real on-the-wire exchange payload, not an estimate.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from calib_gate import end_calib, gated_calib  # noqa: E402
from kafka_cdc_hudi_spark.plans.catalog_text import pipeline_warc_corpus  # noqa: E402
from kafka_cdc_hudi_spark.session import get_spark  # noqa: E402
from kafka_cdc_hudi_spark.sources.tables import load_table  # noqa: E402


def _ui_base(spark) -> str:
    return spark.sparkContext.uiWebUrl


def _stage_shuffle_bytes(spark) -> tuple[int, int]:
    """(sum shuffle write bytes, max single-stage write bytes) over all
    completed stages of this application so far."""
    base = _ui_base(spark)
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    )
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return sum(writes), max(writes or [0])


def _warc_corpus_window_r13(spark, sf_dir):
    """The r13 implementation, reconstructed verbatim: both dedup
    windows partitioned by the FULL normalized body string."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc(docs), avg_row_bytes=1024)
    recs = extract_warc_text(media)
    norm = recs.select(
        "media_id",
        "record_idx",
        F.lower(F.trim(F.regexp_replace("body", r"\s+", " "))).alias("norm"),
    ).filter(F.length("norm") > 0)
    w = Window.partitionBy("norm").orderBy("media_id", "record_idx")
    return (
        norm.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("norm")))
        .filter(F.col("rn") == 1)
        .select(
            F.md5(F.col("norm")).alias("norm_hash"),
            F.col("n_copies").cast("long").alias("n_copies"),
            F.col("media_id").alias("first_media_id"),
            F.col("record_idx").alias("first_record_idx"),
            F.length("norm").cast("long").alias("norm_len"),
        )
    )


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf10"
    spark = get_spark(
        app_name="warc-shuffle", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    stamp = gated_calib(spark)

    # isolate the DEDUP exchange: materialize the shared upstream
    # (fixture encode -> repartition -> Arrow extract -> normalize) once,
    # so the only shuffle each variant performs is its own dedup exchange
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    source = os.environ.get("WARC_SHUFFLE_SOURCE", "warc")
    if source == "docs":
        # realistic body sizes: the fixture slices are 32 bytes (at/below
        # the md5-hex key size, so the two variants tie there); real
        # crawl bodies are KB-scale — the documents' own ~300-char text
        # is the in-container stand-in that shows the key-size effect
        norm = docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit(0).cast("int").alias("record_idx"),
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("norm"),
        ).filter(F.length("norm") > 0).persist()
    else:
        media = media_repartition(documents_as_warc(docs), avg_row_bytes=1024)
        norm = (
            extract_warc_text(media)
            .select(
                "media_id",
                "record_idx",
                F.lower(F.trim(F.regexp_replace("body", r"\s+", " "))).alias("norm"),
            )
            .filter(F.length("norm") > 0)
            .persist()
        )
    n_norm = norm.count()

    def window_variant(df):
        w = Window.partitionBy("norm").orderBy("media_id", "record_idx")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "n_copies", F.count(F.lit(1)).over(Window.partitionBy("norm"))
            )
            .filter(F.col("rn") == 1)
            .select(
                F.md5(F.col("norm")).alias("norm_hash"),
                F.col("n_copies").cast("long").alias("n_copies"),
                F.col("media_id").alias("first_media_id"),
                F.col("record_idx").alias("first_record_idx"),
                F.length("norm").cast("long").alias("norm_len"),
            )
        )

    def agg_variant(df):
        return (
            df.select(
                F.md5("norm").alias("norm_hash"),
                F.length("norm").cast("long").alias("norm_len"),
                F.struct("media_id", "record_idx").alias("occ"),
            )
            .groupBy("norm_hash")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_copies"),
                F.min("occ").alias("first_occ"),
                F.min("norm_len").alias("norm_len"),
            )
            .select(
                "norm_hash",
                "n_copies",
                F.col("first_occ.media_id").alias("first_media_id"),
                F.col("first_occ.record_idx").alias("first_record_idx"),
                "norm_len",
            )
        )

    results = {}
    rows = {}
    for name, builder in (
        ("window_full_text_r13", window_variant),
        ("hash_agg_r14", agg_variant),
    ):
        runs = []
        for i in range(2):  # cold then warm
            pre_sum, _ = _stage_shuffle_bytes(spark)
            t0 = time.perf_counter()
            n = builder(norm).count()
            wall = round(time.perf_counter() - t0, 3)
            post_sum, _ = _stage_shuffle_bytes(spark)
            runs.append({"wall_sec": wall, "shuffle_write_bytes": post_sum - pre_sum})
        rows[name] = n
        results[name] = runs

    assert rows["window_full_text_r13"] == rows["hash_agg_r14"], rows
    end_calib(spark, stamp)
    artifact = {
        "sf_dir": sf_dir,
        "source": source,
        "rows_in": n_norm,
        "rows_out": rows["hash_agg_r14"],
        "variants": results,
        "dedup_shuffle_ratio": round(
            results["window_full_text_r13"][1]["shuffle_write_bytes"]
            / max(1, results["hash_agg_r14"][1]["shuffle_write_bytes"]),
            2,
        ),
        **stamp,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    spark.stop()


if __name__ == "__main__":
    main()
