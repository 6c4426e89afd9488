"""Cross-engine-deterministic numeric aggregation.

The decimal-sum-then-double idiom is the determinism contract with the
DuckDB oracle: decimal sums are exact and order-independent, and the final
decimal->double cast lands on the same value in both engines, so value
hashes match bit-for-bit regardless of partitioning. Plain double SUMs
differ in last-ulp between engines and between runs. ONE definition —
changing the precision here changes every query and every oracle together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact double sum of ``col`` (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)
