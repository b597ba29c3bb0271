"""Cross-engine deterministic numeric helpers.

Spark's round() is HALF_UP (BigDecimal); DuckDB's round() on DOUBLE is
half-even at exact .5 products. When a double*10^s lands exactly on .5
(common with tidy 2-decimal money values) the two disagree by one ulp
of the last kept digit. `fround` sidesteps engine rounding entirely:
floor(x * 10^s + 0.5) / 10^s is the same IEEE op sequence in both
engines, so results are bit-identical.

Use fround()/sql_fround() for every rounded double that reaches a
query's output schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, scale: int = 2) -> Column:
    f = float(10**scale)
    return F.floor(col * f + F.lit(0.5)) / f


def sql_fround(expr: str, scale: int = 2) -> str:
    f = float(10**scale)
    return f"floor(({expr}) * {f} + 0.5) / {f}"


# Exact money sums. fround() makes *rounding* deterministic, but a sum
# of doubles is itself order-dependent (IEEE addition is not
# associative): with enough rows per group, the partition layout decides
# the last ulp, and fround can land either side of a cent boundary —
# exactly the flagship's r01 driver hash-miss. Casting each term to
# DECIMAL(18,4) first makes the sum exact fixed-point arithmetic, so it
# is identical for every partitioning and engine; the cast back to
# double happens on one already-exact scalar per group. The source
# money columns are tidy <=4-decimal values, and a 4-dp decimal
# fraction is never exactly representable in binary, so the double ->
# decimal cast never sits on a rounding-tie either.
_DEC = "decimal(18,4)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded sum of a money/measure double column."""
    return fround(F.sum(col.cast(_DEC)).cast("double"), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of dsum(): exact decimal sum, then the fround idiom."""
    return sql_fround(f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)", scale)


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded mean: exact decimal sum / count."""
    return fround(
        F.sum(col.cast(_DEC)).cast("double") / F.count(col), scale
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    return sql_fround(
        f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE) / count({expr})", scale
    )
