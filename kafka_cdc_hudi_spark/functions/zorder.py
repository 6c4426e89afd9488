"""Z-order (Morton) interleaving for multi-dimensional clustering.

Linear clustering (``sortWithinPartitions(a, b)``) gives parquet row-group
min/max stats real selectivity on ``a`` but leaves ``b`` spanning its full
range in every row group. Interleaving the bits of both dimensions makes
consecutive rows local in EVERY dimension at once, so range predicates on
either column skip row groups — the same lever as Delta/Hudi Z-ORDER
clustering, built here from native bitwise expressions only (no UDF, fully
codegen'd).

Normalization: each column is affinely mapped into ``[0, 2^bits)`` using
caller-supplied bounds (the sink computes them with one min/max agg over
the snapshot — the sampling-free variant of Delta's range-id approach;
exactness is irrelevant because the key only orders rows, it is never
read back).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits per dimension; 2 dims x 16 bits = 32-bit key, plenty of resolution
#: for row-group-level locality (a row group holds >> 2^16th of a file)
ZORDER_BITS = 16


def zorder_key(
    bounds: Sequence[tuple[Column | str, float, float]], bits: int = ZORDER_BITS
) -> Column:
    """Morton key: interleaved bits of each column's normalized cell id.

    ``bounds`` is ``[(col, min, max), ...]`` (2+ dimensions). Values outside
    the bounds clamp to the edge cells; nulls clamp to cell 0 (they sort
    first, matching nulls-first linear clustering). Cost: ``bits * ndims``
    shift/mask terms, all whole-stage-codegen'd — no shuffle, no Python."""
    if len(bounds) < 2:
        raise ValueError("zorder needs >= 2 columns (use plain sort for 1)")
    if bits * len(bounds) > 62:
        raise ValueError(f"bits*ndims must fit a long, got {bits}*{len(bounds)}")
    cells = []
    top = (1 << bits) - 1
    for c, lo, hi in bounds:
        col = F.col(c) if isinstance(c, str) else c
        lo, hi = float(lo), float(hi)
        span = (hi - lo) if hi > lo else 1.0
        cell = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * (1 << bits))
        cell = F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), cell.cast("long")))
        cells.append(F.coalesce(cell, F.lit(0).cast("long")))
    n = len(cells)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
