"""Incremental aggregate maintenance (materialized-view delta application).

At 100 TB the expensive anti-pattern is recomputing a grouped aggregate
from the full table after every sink commit. COUNT/SUM (and anything
derivable from them — AVG, rates) are self-maintainable: apply the commit's
change rows to the previous aggregate state instead of re-scanning.

``maintain_sum_agg`` consumes a PRE-IMAGE diff (``KeyedParquetTable.diff(
..., include_pre_image=True)``): every insert/update contributes its new
values to the new row's group, every update/delete retracts its old values
from the OLD row's group — updates that move a row across groups therefore
adjust both groups correctly. Cost: one union over the (small) change set
+ one shuffle on the group key + a join against the previous state, vs a
full-table scan-and-shuffle for recompute.

Sums run in DECIMAL so maintained state is bit-identical to a fresh
recompute regardless of how many deltas were applied (double sums would
drift by accumulation order) — pinned by the equivalence property in
tests/test_incremental.py.

The maintained state is a MATERIALIZED view: persist it (write to a table,
or at minimum ``localCheckpoint``) after each application, or its lazy
lineage keeps referencing source snapshots that the sink's retention later
prunes out from under it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.numeric import DEC

_CNT = "n_rows"
#: pinned sum dtype: Spark's SUM over DECIMAL(25,6) is DECIMAL(35,6); the
#: maintained state is cast back to it every round so the schema never
#: widens with the number of applied deltas
_SUM_DEC = "decimal(35,6)"


def sum_agg(df: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]) -> DataFrame:
    """The full-recompute reference aggregate: COUNT(*) + exact decimal
    SUMs per group. ``maintain_sum_agg`` maintains exactly this shape."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[
            F.sum(F.col(c).cast(DEC)).cast(_SUM_DEC).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def agg_delta(
    changes: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Per-group aggregate deltas from a pre-image change set.

    Each change row yields up to two contributions: +new values keyed by
    the new group (insert/update) and -old values keyed by the PRE-image
    group (update/delete). The union is over the change set only — the
    base table is never touched."""
    add = changes.filter(F.col("_change_type").isin("insert", "update")).select(
        *[F.col(c) for c in group_cols],
        F.lit(1).cast("long").alias("__dn"),
        *[F.col(c).cast(DEC).alias(f"__d_{c}") for c in sum_cols],
    )
    sub = changes.filter(F.col("_change_type").isin("update", "delete")).select(
        *[F.col(f"_pre_{c}").alias(c) for c in group_cols],
        F.lit(-1).cast("long").alias("__dn"),
        *[(-F.col(f"_pre_{c}").cast(DEC)).alias(f"__d_{c}") for c in sum_cols],
    )
    return (
        add.unionByName(sub)
        .groupBy(*group_cols)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[F.sum(f"__d_{c}").alias(f"__d_{c}") for c in sum_cols],
        )
    )


def maintain_sum_agg(
    prev_agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """New aggregate state = previous state + change deltas. Groups whose
    maintained count reaches zero drop out (matching a fresh recompute);
    brand-new groups appear via the outer join. The previous state is
    dimension-sized relative to the fact table, and the delta side is
    change-set-sized — at scale this is a broadcast or small shuffle,
    never a fact scan."""
    gc = list(group_cols)
    delta = agg_delta(changes, gc, sum_cols)
    j = prev_agg.join(delta, gc, "full_outer")
    zero = F.lit(0).cast("long")
    n = F.coalesce(F.col(_CNT), zero) + F.coalesce(F.col("__dn"), zero)
    dec_zero = F.lit(0).cast(DEC)
    sums = [
        (
            F.coalesce(F.col(f"sum_{c}"), dec_zero)
            + F.coalesce(F.col(f"__d_{c}"), dec_zero)
        )
        .cast(_SUM_DEC)
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return (
        j.select(*gc, n.alias(_CNT), *sums)
        .filter(F.col(_CNT) > 0)
    )


_MIN, _MAX = "min_", "max_"


def minmax_agg(df: DataFrame, group_cols: Sequence[str], val_col: str) -> DataFrame:
    """The full-recompute reference: COUNT(*) + MIN/MAX per group."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(_CNT),
        F.min(val_col).alias(f"{_MIN}{val_col}"),
        F.max(val_col).alias(f"{_MAX}{val_col}"),
    )


def maintain_minmax_agg(
    prev_agg: DataFrame,
    changes: DataFrame,
    base: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
) -> DataFrame:
    """MIN/MAX maintenance via PARTIAL RECOMPUTE.

    Unlike COUNT/SUM, extremes are not self-maintainable under retraction:
    deleting the current minimum requires knowing the runner-up, which the
    aggregate state does not carry. The correct incremental strategy
    splits the change set:

    - groups touched only by INSERTS fold in algebraically
      (``least``/``greatest`` against the previous extremes — no scan);
    - groups with any RETRACTION (update pre-image or delete) recompute
      from ``base`` — but ONLY those groups, via a semi-join the group
      predicate pushes into the scan. Cost is proportional to the hot
      groups' rows, never the full table.

    ``base`` must be the POST-commit table state (the same snapshot
    ``changes`` leads to). Equivalence to a fresh recompute across
    arbitrary change mixes is property-tested in tests/test_incremental.py."""
    gc = list(group_cols)
    retract = (
        changes.filter(F.col("_change_type").isin("update", "delete"))
        .select(*[F.col(f"_pre_{c}").alias(c) for c in gc])
        .distinct()
    )
    recomputed = minmax_agg(base.join(retract, gc, "left_semi"), gc, val_col)
    ins = (
        changes.filter(F.col("_change_type").isin("insert", "update"))
        .select(*gc, F.col(val_col))
        .join(retract, gc, "left_anti")
        .groupBy(*gc)
        .agg(
            F.count(F.lit(1)).alias("__dn"),
            F.min(val_col).alias("__dmin"),
            F.max(val_col).alias("__dmax"),
        )
    )
    untouched = prev_agg.join(retract, gc, "left_anti")
    zero = F.lit(0).cast("long")
    merged = untouched.join(ins, gc, "full_outer").select(
        *gc,
        (F.coalesce(F.col(_CNT), zero) + F.coalesce(F.col("__dn"), zero)).alias(_CNT),
        # least/greatest are null-SKIPPING in Spark but the explicit
        # null-coalescing keeps the intent obvious and engine-portable
        F.when(F.col(f"{_MIN}{val_col}").isNull(), F.col("__dmin"))
        .when(F.col("__dmin").isNull(), F.col(f"{_MIN}{val_col}"))
        .otherwise(F.least(F.col(f"{_MIN}{val_col}"), F.col("__dmin")))
        .alias(f"{_MIN}{val_col}"),
        F.when(F.col(f"{_MAX}{val_col}").isNull(), F.col("__dmax"))
        .when(F.col("__dmax").isNull(), F.col(f"{_MAX}{val_col}"))
        .otherwise(F.greatest(F.col(f"{_MAX}{val_col}"), F.col("__dmax")))
        .alias(f"{_MAX}{val_col}"),
    )
    return merged.unionByName(recomputed).filter(F.col(_CNT) > 0)
