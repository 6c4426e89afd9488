"""Latest-per-key deduplication (reference O15: "Merge the same primary key
data in a batch", /root/reference/glue/cdc_hudi.py:143-163).

Two physical strategies for the same logical op:

- ``latest_per_key``: ``row_number()`` over ``Window.partitionBy(keys)`` —
  the reference's shape. On Spark >= 3.5 Catalyst inserts a
  ``WindowGroupLimit`` (rank-limit pushdown) so each partition keeps only the
  running top-1 before the sort — already far better than a full sort.
- ``latest_per_key_agg``: ``max_by(struct(*), ordering_struct)`` — a hash
  aggregate with map-side partial aggregation. At 100 TB this is usually the
  winner: the combiner collapses duplicates BEFORE the shuffle, so shuffle
  volume is ~unique-keys instead of ~events, and no sort is needed.

Both are deterministic given tiebreakers that make the ordering key unique.
The reference orders by ``mtime`` alone (ties nondeterministic); we add
explicit tiebreakers (SURVEY §7 M2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "mtime",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per (composite) key — window strategy."""
    order = [F.col(order_col).desc_nulls_last()] + [F.col(t).desc_nulls_last() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "mtime",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per key — max_by aggregate strategy (map-side
    combine; preferred at scale for high-duplication streams). Skew-immune
    for top-1: the partial aggregate collapses every hot key to one row per
    input partition before the shuffle."""
    ord_struct = F.struct(F.col(order_col), *[F.col(t) for t in tiebreakers])
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(F.max_by(payload, ord_struct).alias("__row"))
    return agg.select("__row.*")


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows per key by descending (order_col, tiebreakers) — direct
    window strategy (one shuffle; ``WindowGroupLimit`` prunes to a running
    top-k per task before the sort)."""
    order = [F.col(order_col).desc_nulls_last()] + [
        F.col(t).desc_nulls_last() for t in tiebreakers
    ]
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def topk_per_key_salted(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    tiebreakers: Sequence[str] = (),
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-resistant top-k per key: two phases.

    Phase 1 windows over (key, salt) so a hot key's rows are spread across
    ``salt_buckets`` tasks, each keeping only its local top-k; phase 2 runs
    the exact top-k over the surviving ``k * salt_buckets`` rows per key.
    The second shuffle moves at most ``k * salt_buckets`` rows per key no
    matter how hot the key was — the standard salting pattern for windowed
    ranking where a single key would otherwise pin one task
    (partial aggregation cannot help ``row_number``).

    Salt is derived deterministically from a hash of ALL columns, so results
    are stable run-to-run AND rows sharing the ordering value still spread
    across buckets — salting by the ordering columns alone would collapse a
    hot key with one repeated mtime into a single bucket, which is exactly
    the skewed shape this function exists for. Equal to :func:`topk_per_key`
    whenever (order_col, tiebreakers) is unique per row.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)).alias(
        "__salt"
    )
    phase1 = topk_per_key(
        df.withColumn("__salt", salt),
        [*keys, "__salt"],
        order_col,
        k,
        tiebreakers,
    ).drop("__salt")
    return topk_per_key(phase1, keys, order_col, k, tiebreakers)
