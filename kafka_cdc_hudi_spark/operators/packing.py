"""Sequence packing — the concat-and-chunk step of an LLM pretraining
pipeline, as a native Spark plan.

GPT-style pretraining concatenates documents (with separators handled by the
tokenizer) and slices the stream into fixed-length training sequences. At
100 TB that must not be a single sequential pass: documents are first
assigned to SHARDS by a deterministic salted hash (stable across runs,
engines, and repartitioning — same idiom as ``dataset_split_assign``), and
the concat order is defined WITHIN each shard only. Each shard's packing is
then one window cumsum:

    cum_before(doc) = sum of token counts of all earlier docs in the shard
    seq_id          = cum_before div seq_tokens   (first sequence the doc
                                                   lands in)
    offset_in_seq   = cum_before mod seq_tokens

so a doc may straddle sequence boundaries (exactly like the real pipeline —
consumers slice by offset); no doc is dropped and no padding is implied.

Plan shape: one shuffle (hash partition by shard) + one per-shard sort on
the stable doc order. Parallelism = number of shards — at 100 TB you run
thousands of shards, each a few GB, so the inherently-sequential cumsum
never serializes more than one shard's worth of metadata (token counts,
not text, flow through the window). Zero Python; the token count is the
same codegen'd expression the text-analysis operators use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.textfns import token_count
from kafka_cdc_hudi_spark.functions.timefns import floordiv_long


def shard_assign(id_col: Column | str, n_shards: int, salt: str) -> Column:
    """Deterministic shard id in [0, n_shards): salted md5 of the key,
    first 15 hex digits as a bigint (fits in 60 bits — no overflow), mod
    n_shards. Identical byte-for-byte in DuckDB via
    ``CAST('0x' || substring(md5(..)) AS BIGINT)``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(F.concat(c.cast("string"), F.lit(f"|{salt}"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % n_shards
    )


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack_v1",
) -> DataFrame:
    """Assign each document its (shard, seq_id, offset_in_seq) under
    concat-and-chunk packing with ``seq_tokens``-token sequences.

    Output: ``id_col``, shard, n_tokens, seq_id, offset_in_seq — enough for
    a consumer to materialize any training sequence by slicing the docs
    whose [cum_before, cum_before + n_tokens) span intersects
    [seq_id * L, (seq_id + 1) * L).
    """
    d = docs.select(
        F.col(id_col),
        shard_assign(id_col, n_shards, salt).alias("shard"),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    # floordiv_long, not floor(double division): past 2^53 cumulative tokens
    # per shard the double quotient rounds while the % stays exact, making
    # (seq_id, offset_in_seq) internally inconsistent
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        floordiv_long(cum_before, seq_tokens).alias("seq_id"),
        (cum_before % seq_tokens).alias("offset_in_seq"),
    )
