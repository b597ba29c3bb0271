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


# Tracking params canonicalize_url strips, anchored with '=' so a
# legitimate 'referrer_policy'/'refresh' param survives: the standard
# analytics/click-id families plus bare 'ref' (the reference's detail
# URLs carry exactly such per-crawl ref params, test.py:417-419).
URL_TRACKING_RE = "^(utm_[^=]*|ref|fbclid|gclid)="


def canonicalize_url(col: Column) -> Column:
    """Canonical crawl-record URL identity — the dedup key the
    reference effectively uses for its incremental skip (Q2 dedups on
    job_url, test.py:155-165, after stripping the query to derive the
    job key, test.py:417-419):

    - scheme and host lowercased (the case-insensitive parts per the
      URL spec; path/query case is preserved, and so is USERINFO —
      user:pass@ is case-sensitive per RFC 3986, so only the part of
      the authority after the last '@' is lowered),
    - fragment stripped (never sent to the server),
    - tracking params removed (URL_TRACKING_RE), real params kept in
      their original order — a '?page=2' listing page stays distinct
      from page 1,
    - a query left empty by the strip loses its '?'.

    Pure Catalyst expression chain (regexp + higher-order filter), no
    UDF — stays inside whole-stage codegen at 100 TB scan width."""
    nofrag = F.regexp_replace(col, "#.*$", "")
    qpos = F.instr(nofrag, "?")
    # split at the FIRST '?' (substring is 1-based; qpos==0 means none)
    base = F.when(qpos > 0, nofrag.substr(F.lit(1), qpos - 1)).otherwise(nofrag)
    qs = F.when(
        qpos > 0, nofrag.substr(qpos + 1, F.length(nofrag))
    ).otherwise(F.lit(""))
    scheme = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://)", 1)
    auth = F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1)
    # greedy [^/]* before the @ -> everything up to the LAST @ is
    # userinfo (the RFC parse); '' when the authority has none
    ui = F.regexp_extract(auth, "^([^/]*@)", 1)
    host = auth.substr(F.length(ui) + 1, F.length(auth))
    rest = base.substr(
        F.length(scheme) + F.length(auth) + 1, F.length(base)
    )
    kept = F.array_join(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(URL_TRACKING_RE),
        ),
        "&",
    )
    return F.concat(
        F.lower(scheme),
        ui,
        F.lower(host),
        rest,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
