"""Vector column functions over array<float> embeddings.

All arithmetic is forced to DOUBLE before accumulating, and accumulation is
a left fold in list order (``F.aggregate``) — this makes results
bit-identical to an oracle that sums ``CAST(x AS DOUBLE)*CAST(y AS DOUBLE)``
over a parallel unnest in list order. Staying in Spark's higher-order
functions keeps the whole computation JVM-side (no Python round-trip),
which is the scale path for 100 TB similarity scans; a Pandas-UDF variant
would pay Arrow transfer for no gain here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
