"""Scalar cleaning/encoding column functions.

These generalize the reference's per-field string munging into
reusable, Catalyst-native column expressions (all JVM-side, inside
whole-stage codegen — no Python in the hot path):

- token strip/trim    <- reference test.py:187,199 (strip '更新',
                         '應徵人數', '人' around ~20 call sites)
- conditional encode  <- reference test.py:190-194 ('積極徵才中' -> 是/否)
- date parse          <- reference test.py:185-188 (yyyy/mm/dd after strip)
- range parse         <- reference test.py:196-204 ('0~5' applicants)
- url key extraction  <- reference test.py:417-419 (split('/')[-1]
                         .split('?')[0])
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_tokens(col: Column, tokens: list[str]) -> Column:
    """Trim whitespace and strip literal tokens anywhere in the string.

    Trims UNICODE whitespace (\\p{Z} covers U+00A0 etc.), matching the
    reference's Python str.strip() semantics — Spark's trim() only
    strips ASCII space."""
    out = col
    for t in tokens:
        # tokens are literals, not patterns: quote them so regex
        # metacharacters ('C++', '(人)', '0~5?') can't corrupt the match
        out = F.regexp_replace(out, F.lit("\\Q" + t + "\\E"), F.lit(""))
    return F.regexp_replace(out, F.lit(r"^[\s\p{Z}]+|[\s\p{Z}]+$"), F.lit(""))


def conditional_encode(col: Column, mapping: dict[str, str], default: str) -> Column:
    """CASE WHEN chain mapping exact values to labels."""
    expr: Column | None = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    assert expr is not None, "mapping must be non-empty"
    return expr.otherwise(default)


def encode_bool_cn(col: Column, truthy: str) -> Column:
    """The reference's 是/否 encode (test.py:190-194)."""
    return F.when(col == truthy, "是").otherwise("否")


def parse_date_tokenized(col: Column, strip: list[str], fmt: str = "yyyy/MM/dd") -> Column:
    """Strip locale tokens then parse a date (reference test.py:185-188)."""
    return F.to_date(clean_tokens(col, strip), fmt)


def parse_range(col: Column, sep: str = "~") -> tuple[Column, Column]:
    """'lo~hi' -> (lo int, hi int) (reference test.py:196-204).

    try_element_at + try_cast, not element_at + cast: the reference
    null-defaults unparseable fields (its try/except at
    test.py:201-204); the ANSI-mode variants would instead fail the
    whole job on one malformed row (missing separator or non-numeric)."""
    parts = F.split(col, sep)
    return (
        F.try_element_at(parts, F.lit(1)).try_cast("int"),
        F.try_element_at(parts, F.lit(2)).try_cast("int"),
    )


def extract_url_key(col: Column) -> Column:
    """Last path segment without query string (reference test.py:417-419)."""
    return F.regexp_extract(col, r"/([^/?]+)(\?.*)?$", 1)
