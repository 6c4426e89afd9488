"""Timestamp-type-robust time helpers.

The driver's testdata parquet has changed physical timestamp encoding across
rounds (TIMESTAMP(NANOS) -> read as long via ``nanosAsLong``; then
TIMESTAMP(MICROS) without UTC adjustment -> read as TIMESTAMP_NTZ). Operators
must not care: every arithmetic path routes through these helpers, which
coerce any timestamp flavor to the session-UTC instant first.

``TIMESTAMP_NTZ -> TIMESTAMP`` interprets the wall clock in the session time
zone; session.py pins that to UTC, which is exactly how DuckDB treats a naive
parquet timestamp — so oracle comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_SEC = 1_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_instant(c: Column | str) -> Column:
    """Coerce TIMESTAMP / TIMESTAMP_NTZ / date / ISO string to TIMESTAMP
    (a no-op cast when already TIMESTAMP)."""
    return _col(c).cast("timestamp")


def epoch_micros(c: Column | str) -> Column:
    """Epoch microseconds as LONG — exact, unlike a double cast."""
    return F.unix_micros(to_instant(c))


def epoch_millis(c: Column | str) -> Column:
    """Epoch milliseconds as LONG (``unix_millis`` rejects TIMESTAMP_NTZ;
    this accepts it)."""
    return F.unix_millis(to_instant(c))


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds as DOUBLE with microsecond precision — the NTZ-safe
    replacement for ``cast(ts as double)`` (illegal on TIMESTAMP_NTZ).
    Exact: epoch micros (~2e15) stay under DOUBLE's 53-bit mantissa."""
    return epoch_micros(c) / F.lit(float(MICROS_PER_SEC))
