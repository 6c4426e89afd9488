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
    The micros LONG itself is exact (< 2^53); the /1e6 division then rounds
    like any binary double, so cross-engine comparisons only hold when the
    other engine performs the same single micros/1e6 division (DuckDB's
    ``epoch()`` does; the oracles rely on that, not on decimal exactness)."""
    return epoch_micros(c) / F.lit(float(MICROS_PER_SEC))


def floordiv_long(c: Column, divisor: int) -> Column:
    """EXACT floor division of a LONG column by a positive int literal.
    ``floor(a / b)`` on doubles rounds once ``a`` exceeds 2^53 (and Spark's
    ``/`` promotes longs to doubles BEFORE dividing), so: ``pmod``
    (non-negative remainder, so the result is floor- not truncate-division
    even for negative ``a`` such as pre-1970 timestamps) reduces the
    numerator to an exact multiple of ``divisor``, and the division runs in
    DECIMAL(38,0) where the integer quotient is always exactly
    representable. Matches DuckDB's ``//`` on BIGINT bit-for-bit."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    d = F.lit(divisor).cast("long")
    # subtract in decimal too: long-domain `c - pmod` can wrap at Long.MIN
    exact_multiple = c.cast("decimal(38,0)") - F.pmod(c, d).cast("decimal(38,0)")
    return (exact_multiple / F.lit(divisor).cast("decimal(38,0)")).cast("long")
