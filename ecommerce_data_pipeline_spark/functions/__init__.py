"""Shared column-expression helpers (SURVEY.md §2.6 scalar functions).

Money discipline: the reference carries money as double dollars converted
from integer cents (silver_payments.py:45). Summing 2-dp doubles is
float-order-sensitive, so every money aggregate here goes through
``money_sum``: round to integer cents, sum exactly as int64, divide once.
This is bit-identical across engines and summation orders — which is both
the oracle-parity trick and the right call at 100 TB where partial-aggregate
ordering is nondeterministic by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str) -> Column:
    """Exact sum of a 2-dp dollar column: cents-int64 sum / 100."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * F.lit(100)).cast("long")) / F.lit(100.0)


def money_sum_sql(expr: str) -> str:
    """DuckDB twin of money_sum for oracle SQL."""
    return f"sum(CAST(round(({expr})*100) AS BIGINT))/100.0"


def cents_to_dollars(cents: Column) -> Column:
    """amount_cents → double dollars (silver_payments.py:45)."""
    return cents.cast("double") / F.lit(100.0)


def epoch_micros(col: Column | str) -> Column:
    """NTZ-safe microseconds-since-epoch.

    Spark 4 rejects both ``CAST(TIMESTAMP_NTZ AS DOUBLE)`` and
    ``unix_micros(TIMESTAMP_NTZ)``; the parquet testdata stores ``ts`` as
    ``timestamp[us]`` which Spark 4 reads as TIMESTAMP_NTZ. The session
    timezone is pinned UTC (session.py), so casting NTZ → TIMESTAMP_LTZ is a
    pure reinterpretation with no wall-clock shift — and the cast is a no-op
    for columns that are already LTZ. Use this (never ``cast("double")`` /
    raw ``unix_micros``) for all timestamp arithmetic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))


def epoch_seconds(col: Column | str) -> Column:
    """NTZ-safe fractional epoch seconds (double)."""
    return epoch_micros(col) / F.lit(1e6)


def synthetic_id(prefix: str, *parts: Column) -> Column:
    """sha256 lineage id over ':'-joined parts (silver_payments.py:53-54)."""
    return F.sha2(F.concat_ws(":", F.lit(prefix), *parts), 256)


