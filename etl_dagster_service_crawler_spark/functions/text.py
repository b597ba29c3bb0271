"""Text-analysis column functions for LLM data pipelines.

All pure built-in expressions (JVM-side): tokenization, n-grams,
language ID, quality scoring, fingerprints. These extend the
reference's string handling (test.py:208-209 tokenized fields,
test.py:548-549 quality heuristic) to the training-data-pipeline
surface required by BASELINE.json.

Cross-engine notes (DuckDB oracle parity):
- whitespace tokens: split(text,' ') == string_split(text,' ')
- BPE-ish tokens: same regex under Java regex & RE2 (character
  classes + alternation only)
- rolling hash: identical fold both engines (verified bit-equal)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# per-language stopword probes for the n-gram/lexicon language-ID
# heuristic; must match the oracle SQL in workloads/llm.py verbatim.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "und", "ein", "zu"],
    "fr": ["le", "la", "et", "un", "de"],
    "es": ["el", "los", "y", "un", "de"],
    "zh": ["的", "是", "了", "在", "和"],
}


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens."""
    return F.split(col, " ")


def token_count_ws(col: Column) -> Column:
    return F.size(tokens_ws(col))


def token_count_bpe_ish(col: Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / single punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def word_ngrams(toks: Column, n: int) -> Column:
    """Sliding word n-grams as space-joined strings; empty array when
    the doc has fewer than n tokens (sequence() would run backwards)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def lang_id(col: Column) -> Column:
    """Deterministic lexicon-vote language ID (priority order breaks
    ties). A real system would use character n-gram profiles; the
    lexicon vote is the same dataflow shape and fully oracle-checkable."""
    toks = tokens_ws(col)
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_STOPWORDS}
    langs = list(LANG_STOPWORDS)
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = hits[lang] >= hits[other]
            cond = c if cond is None else cond & c
        cond = cond & (hits[lang] > 0)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("und")


def quality_score(text_col: Column, n_chars: Column) -> Column:
    """Blend of length saturation and stopword density (reference's
    empty-field heuristic, test.py:548-549, generalized to continuous
    scoring). Returns a raw double — identical IEEE ops in DuckDB."""
    toks = tokens_ws(text_col)
    n_tok = F.size(toks).cast("double")
    stop_ratio = stopword_hits(toks, "en").cast("double") / n_tok
    len_sat = F.least(n_tok / 100.0, F.lit(1.0))
    return 0.5 * len_sat + 0.5 * stop_ratio


def fingerprint_md5(col: Column) -> Column:
    return F.md5(col)


def fingerprint_rolling(col: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (document fingerprinting).
    acc stays < mod, acc*31+127 < 2^35 — no bigint overflow."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + F.ascii(x)) % mod,
    )
