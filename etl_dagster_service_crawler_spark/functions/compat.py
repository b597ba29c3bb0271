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
# exactly the flagship's r01 driver hash-miss. The fix is fixed-point:
# snap each term to an integer count of 1e-4 units with the fround idiom
# (floor(x*1e4 + 0.5) — the SAME IEEE op sequence in both engines, so
# per-row values agree bit-for-bit, unlike double->DECIMAL casts whose
# HALF_UP/half-even tie-breaks differ between Spark and DuckDB), then
# sum BIGINTs, which is exact and associative — identical for every
# partition layout. Integer arithmetic is also cheaper than decimal128:
# the r02 decimal sums cost the flagship +12% / topk +26% vs plain
# doubles (VERDICT r2).
#
# Overflow bound: terms are |x|*1e4 <= ~1e9 for the fixture magnitudes,
# so int64 holds ~9e18/1e9 = 9e9 rows per GROUP. Giant groups beyond
# that (TPC-H SF1e5 nation groups reach ~2.4e10 lineitems) swap the
# accumulator to sum(cents.cast('decimal(38,0)')) — still exact and
# order-independent, one line, at decimal-sum cost for just those
# queries. ANSI mode turns a silent wrap into a hard error, so the
# bound is enforced, not hoped for.

_UNIT = 1e4  # fixed-point unit: 1e-4 (covers 2-dp money and 4-dp rates)


def to_cents(col: Column) -> Column:
    """Half-up fixed-point snap to BIGINT 1e-4 units (Spark floor on
    double already returns LONG)."""
    return F.floor(col * F.lit(_UNIT) + F.lit(0.5))


def sql_to_cents(expr: str) -> str:
    """DuckDB twin of to_cents (floor returns DOUBLE there, so cast)."""
    return f"CAST(floor(({expr}) * 1e4 + 0.5) AS BIGINT)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded sum of a money/measure double column."""
    return fround(F.sum(to_cents(col)).cast("double") / F.lit(_UNIT), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of dsum(): exact BIGINT unit sum, then the fround
    idiom (DuckDB sums BIGINT into HUGEINT — exact, no overflow)."""
    return sql_fround(f"CAST(sum({sql_to_cents(expr)}) AS DOUBLE) / 1e4", scale)


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded mean: exact unit sum / count."""
    return fround(
        F.sum(to_cents(col)).cast("double") / F.lit(_UNIT) / F.count(col), scale
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    return sql_fround(
        f"CAST(sum({sql_to_cents(expr)}) AS DOUBLE) / 1e4 / count({expr})", scale
    )
