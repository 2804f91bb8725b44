"""Shared column helpers, built for cross-engine hash stability.

Why the decimal dance: the test tables store money as DOUBLE, and a
parallel SUM(double) is order-dependent in IEEE float — Spark (32-way
partial aggregation) and DuckDB would disagree in the low bits. Casting
to DECIMAL(38,2) first makes the sum exact and order-independent; the
final CAST back to DOUBLE is a single correctly-rounded conversion both
engines perform identically. Averages are then one IEEE division
(double / bigint) — also bit-deterministic. No ROUND() calls, whose
tie-breaking differs subtly between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DEC = "decimal(38,2)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent SUM of a 2-decimal money double, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY_DEC)).cast("double")


def dec_sum_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,2))) AS DOUBLE)"


def det_avg(col: Column | str) -> Column:
    """Bit-deterministic average: exact decimal sum, one double division."""
    return dec_sum(col) / F.count(F.lit(1))


def det_avg_sql(expr: str) -> str:
    return f"({dec_sum_sql(expr)} / COUNT(*))"
