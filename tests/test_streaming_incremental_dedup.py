"""Streaming incremental dedup — the marquee composition: document
batches arrive as a stream, ``foreachBatch`` maintains a MinHash
SIGNATURE INDEX across batches and probes ONLY the new batch's bands
against it. Base x base work never re-runs; each near-dup pair is
discovered exactly once — in the batch where its LATER document arrives.

Invariant pinned: the union of per-batch flagged pairs over the whole
stream equals the full-corpus batch LSH result (dedup_minhash_lsh) on the
same documents — streaming ingest loses nothing and re-finds nothing.
"""

import pytest

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _batch_processor(spark, sig_store: str, pairs_store: str):
    """foreachBatch body: probe new docs' bands against the accumulated
    index, append flagged pairs, then append the new signatures."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _est_jaccard_filter,
        _lsh_bands,
        minhash_signatures_for,
    )

    def process(batch_df, batch_id: int):
        sig_new = minhash_signatures_for(
            batch_df.repartition(spark.sparkContext.defaultParallelism)
        ).persist()
        try:
            try:
                # exclude this batch's own partition: an at-least-once
                # REPLAY must probe the same 'prior' index the original
                # run saw, not its own half-written output
                sig_old = spark.read.parquet(sig_store).filter(
                    F.col("bid") < batch_id
                ).drop("bid")
            except Exception:  # first batch: empty index
                sig_old = None
            sig_all = (
                sig_new if sig_old is None else sig_old.unionByName(sig_new)
            )
            bands_new = _lsh_bands(sig_new)
            bands_all = _lsh_bands(sig_all)
            cand = (
                bands_new.alias("a")
                .join(
                    bands_all.alias("b"),
                    (F.col("a.bi") == F.col("b.bi"))
                    & (F.col("a.bv") == F.col("b.bv"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")),
                )
                .select(
                    F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                )
                .distinct()
            )
            flagged = _est_jaccard_filter(sig_all, cand)
            # exactly-once under at-least-once replay: the standard
            # foreachBatch idiom — write each batch to its batch-id
            # partition with OVERWRITE, so a replayed batch replaces its
            # own output instead of double-appending
            flagged.write.mode("overwrite").parquet(f"{pairs_store}/bid={batch_id}")
            sig_new.write.mode("overwrite").parquet(f"{sig_store}/bid={batch_id}")
        finally:
            sig_new.unpersist()

    return process


@pytest.mark.slow
def test_streaming_ingest_finds_all_pairs_exactly_once(spark, tmp_path):
    from kafka_cdc_hudi_spark.plans.catalog_text import dedup_minhash_lsh
    from kafka_cdc_hudi_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # 3 ingest batches split by doc_id; write as json files the stream
    # consumes one per micro-batch
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).json(str(tmp_path / f"slice{i}"))
    import os
    import shutil

    n = 0
    for i in range(3):
        d = tmp_path / f"slice{i}"
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                shutil.copy(d / f, src / f"b{i}_{n}.json")
                n += 1

    sig_store = str(tmp_path / "sig_index")
    pairs_store = str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(_batch_processor(spark, sig_store, pairs_store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    def read_pairs():
        return {
            (r.doc_a, r.doc_b): round(r.est_jaccard, 9)
            for r in spark.read.parquet(pairs_store).collect()
        }

    streamed = read_pairs()
    batch = {
        (r.doc_a, r.doc_b): round(r.est_jaccard, 9)
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    assert streamed == batch
    assert streamed, "fixture produced no near-dup pairs — vacuous"
    # exactly-once discovery: a pair flagged in more than one batch would
    # show up as duplicate rows
    assert spark.read.parquet(pairs_store).count() == len(streamed)
    # the signature index holds every doc exactly once
    assert spark.read.parquet(sig_store).count() == docs.count()

    # at-least-once REPLAY: foreachBatch may re-deliver a batch after a
    # crash-restart. Re-invoke the processor manually with exactly the
    # docs the stream's batch 2 carried (read back from the index's bid=2
    # partition — no assumption about file->batch ordering) — the
    # batch-id-partitioned overwrite must leave both stores equivalent
    # (no double-append, same pairs).
    bid2_ids = spark.read.parquet(sig_store).filter("bid = 2").select("doc_id")
    _batch_processor(spark, sig_store, pairs_store)(docs.join(bid2_ids, "doc_id"), 2)
    assert read_pairs() == streamed
    assert spark.read.parquet(pairs_store).count() == len(streamed)
    assert spark.read.parquet(sig_store).count() == docs.count()
