"""Text-analysis column helpers (north-star C13; SURVEY.md §2C).

All helpers return Column expressions built purely from built-in
functions — they stay inside whole-stage codegen, no Python UDFs in
the hot path. Tokenization is whitespace-based to match the DuckDB
oracle's string_split exactly (both produce [''] for '').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles joined by single spaces; empty array when the
    document has fewer than n tokens.

    Built by zip_with-ing n shifted slices of the token array, NOT by
    transform(sequence, i -> element_at(toks, i+j)): higher-order
    lambdas are interpreted without common-subexpression elimination,
    so an element_at(toks, ...) inside the lambda re-evaluates the
    whole ``toks`` expression (e.g. split(lower(text))) PER POSITION —
    quadratic per row. Slices evaluate ``toks`` O(n) times per row and
    the zip_with lambdas only touch their (already materialized)
    slice arguments."""
    m = F.size(toks) - (n - 1)  # shingle count when size >= n
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(text_col: str, n: int = 3) -> str:
    """DuckDB twin of word_shingles over ``text_col`` (returns a SQL
    fragment; expects an alias context where the column is visible)."""
    t = f"string_split(lower({text_col}), ' ')"
    concat = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"[{concat.replace('ts[', t + '[')} FOR i IN range(1, len({t}) - {n - 2})] "
        f"ELSE [] END"
    )


# every character the punctuation counter treats as NON-punctuation
_ALNUM_SPACE = (
    " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def punct_count(text: Column | str) -> Column:
    """Number of characters outside [a-zA-Z0-9 ] — value-identical to
    ``regexp_count(text, '[^a-zA-Z0-9 ]')`` (the DuckDB oracles keep
    that regex form), computed as ``length(translate(text,
    alnum+space, ''))``: translate deletes the listed characters with
    a plain per-character lookup, so what remains IS the punctuation
    count. Both formulations count Unicode code points (surrogate
    pairs = 1), verified equal on CJK/combining/supplementary/NBSP
    cases and corpus-wide.

    Why not the regex (r14 optimization round, session 3): on a
    multilingual corpus every CJK character matches the negated
    class, and regexp_count's per-match Matcher iteration measured
    **38.5 s vs 1.0 s for translate at sf10** — it was 85% of
    q_text_stats' runtime and a hidden cost in the funnel's quality
    gate."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.translate(c, _ALNUM_SPACE, ""))


STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "pour", "avec"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "para", "con"),
}


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (codegen filter)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_hits_sql(tokens_expr: str, lang: str) -> str:
    """DuckDB twin of stopword_hits."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_expr}, t -> t IN ({words})))"
