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
