"""Generate upsampled scale-test data (VERDICT r5 item 5).

Upsamples /root/testdata/sf0.1 by an integer factor into
.scaledata/sf{factor/10} (gitignored) so the heavy query set can be
measured at ~10x and checked for ~linear scaling. Deterministic, preserves
per-key density (both keys AND rows multiply by the factor):

- events: copy i shifts event_id by i*100000 (a multiple of 10, so the
  CDC fixtures' id%2 / id%10 op assignment distribution is preserved) and
  user_id by i*1500 — events-per-user stays constant, sessions per user
  stay constant, hot-key structure is replicated rather than inflated.
- documents: copy i shifts doc_id by i*5000 and rotates the text alphabet
  with copy-specific `translate` mappings, so cross-copy documents are NOT
  near-duplicates — otherwise minhash/LSH candidate pairs would grow
  quadratically in the copy factor instead of linearly with the corpus,
  which would measure fixture artifacts, not scaling.

Usage: python scripts/make_scale_data.py [factor] [table,table,...]
(default factor 10, all tables)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.session import get_spark
from kafka_cdc_hudi_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
EVENT_ID_STEP = 100_000  # > max event_id, multiple of 10
USER_ID_STEP = 1_500  # > max user_id
DOC_ID_STEP = 5_000  # > max doc_id
VEC_ID_STEP = 10_000  # > max vec_id

#: per-copy consonant rotations: each copy maps the alphabet differently so
#: shingles differ across copies (vowels/spaces kept: text stays text-like).
#: Beyond 20 copies the consonant rotation alone cycles — copies i and
#: i+20 would carry IDENTICAL text under different doc_ids, so LSH pair
#: counts at factor 100 would measure the fixture, not the corpus. A
#: second, slower-cycling vowel rotation (i // 20) keeps all mappings
#: distinct up to factor 100 while factors <= 20 are byte-identical to
#: the r5-r10 outputs (vowel rotation 0 is the identity).
_SRC_ALPHA = "bcdfghjklmnpqrstvwxz"
_VOWELS = "aeiou"


def _rot(i: int) -> str:
    return _SRC_ALPHA[i % len(_SRC_ALPHA) :] + _SRC_ALPHA[: i % len(_SRC_ALPHA)]


def _vrot(i: int) -> str:
    j = (i // len(_SRC_ALPHA)) % len(_VOWELS)
    return _VOWELS[j:] + _VOWELS[:j]


def _scramble_text(col, i: int):
    out = F.translate(col, _SRC_ALPHA, _rot(i)) if i % len(_SRC_ALPHA) else col
    if (i // len(_SRC_ALPHA)) % len(_VOWELS):
        out = F.translate(out, _VOWELS, _vrot(i))
    return out


def main(factor: int = 10, tables: set[str] | None = None) -> str:
    """``tables`` restricts generation (e.g. {"documents"} for the sf10
    text-family scale runs — the other tables aren't needed and events at
    factor 100 would dominate the write)."""

    def want(t: str) -> bool:
        return tables is None or t in tables

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        f"sf{factor / 10:g}",
    )
    spark = get_spark(shuffle_partitions=32)

    if want("events"):
        events = load_table(spark, SRC, "events")
        copies = [
            events.select(
                (F.col("event_id") + i * EVENT_ID_STEP).alias("event_id"),
                "ts",
                (F.col("user_id") + i * USER_ID_STEP).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(factor)
        ]
        ev = copies[0]
        for c in copies[1:]:
            ev = ev.unionByName(c)
        ev.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )

    if want("documents"):
        docs = load_table(spark, SRC, "documents")
        dcopies = [
            docs.select(
                (F.col("doc_id") + i * DOC_ID_STEP).alias("doc_id"),
                _scramble_text(F.col("text"), i).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
            for i in range(factor)
        ]
        dc = dcopies[0]
        for c in dcopies[1:]:
            dc = dc.unionByName(c)
        dc.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )

    if want("embeddings"):
        # embeddings: shift vec_id per copy and deterministically rotate
        # each vector (element roll by copy index) — copies are NOT
        # identical points, so ANN top-k at scale isn't a degenerate
        # tie-break fixture
        emb = load_table(spark, SRC, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        ecopies = [
            emb.select(
                (F.col("vec_id") + i * VEC_ID_STEP).alias("vec_id"),
                (
                    F.concat(
                        F.slice("embedding", i % dim + 1, dim - i % dim),
                        F.slice("embedding", 1, i % dim),
                    )
                    if i
                    else F.col("embedding")
                ).alias("embedding"),
                "label",
            )
            for i in range(factor)
        ]
        ec = ecopies[0]
        for c in ecopies[1:]:
            ec = ec.unionByName(c)
        ec.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, "embeddings.parquet")
        )

    if want("customer"):
        # customer: the realistic scale shape is a dimension that grows far
        # slower than the facts. sf0.1's c_custkey range [0, 15000) covers
        # the shifted user_ids only up to factor 10 (USER_ID_STEP * factor
        # ids are needed), so replicate the dim just enough copies to keep
        # the enriched-IVM join total — a silent coverage gap would make
        # scale runs measure a half-empty join, not scaling
        cust = load_table(spark, SRC, "customer")
        n_cust = cust.count()  # 15000 at sf0.1
        dim_copies = -(-(USER_ID_STEP * factor) // n_cust)  # ceil
        dcu = cust
        for i in range(1, dim_copies):
            dcu = dcu.unionByName(
                cust.select(
                    (F.col("c_custkey") + i * n_cust).alias("c_custkey"),
                    *[c for c in cust.columns if c != "c_custkey"],
                )
            )
        dcu.repartition(4).write.mode("overwrite").parquet(
            os.path.join(out_dir, "customer.parquet")
        )

    made = sorted(t for t in ("events", "documents", "embeddings", "customer") if want(t))
    print(f"wrote {out_dir}: {', '.join(made)} (facts x{factor}; customer dim grows ~linearly in ids)")
    return out_dir


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10,
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
    )
