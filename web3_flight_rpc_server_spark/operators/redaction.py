"""PII detection and redaction (north-star C13/C26 curation stage).

A training-data pipeline scrubs personally identifiable information
before anything ships: emails, phone numbers, IP addresses, long card
numbers, SSN-shaped ids. This module does both halves as pure
built-in regexp expressions (JVM codegen, no UDFs):

- :func:`pii_counts` — per-class match counts, for routing/metrics
  (how contaminated is a source?).
- :func:`redact_pii` — replace each match with a fixed placeholder
  token (``<EMAIL>`` …), preserving surrounding text.

Replacements are FIXED literals, never backreferences — `$1` (Java)
vs `\\1` (RE2/DuckDB) backref syntax is the classic cross-engine trap,
and placeholders are what LLM-corpus scrubbing wants anyway (the
model should see a typed hole, not a half-redacted fragment).

Class order matters and is fixed: CARD before PHONE (a 16-digit card
with separators contains phone-shaped substrings), IP before PHONE
(dotted quads contain digit runs), EMAIL first (emails contain
dot-separated digit-ish hosts). The fixture corpus contains no PII
(all-letter token soup, verified zero digits), so this operator is
pytest-verified against constructed rows (tests/test_redaction.py)
rather than driver-declared — a declared query over clean fixtures
would be vacuous.

No counterpart in the reference; the closest analog is its address
normalization (lower-casing, LogSubscription.java:43-45), which is
identity-preserving, not redacting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order is the application order (see module docstring).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    # 13-19 total digits: 13-digit Visa PANs through 19-digit
    # Maestro/UnionPay — the repeated group supplies 12-18 digits plus
    # the final literal one
    ("card", r"\b(?:\d[ -]?){12,18}\d\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    # (?<![\d-]) pins the start to a non-digit context: without it the
    # pattern matches a 13-digit SUFFIX inside any longer digit run —
    # uint256 values, tx hashes, order ids — half-redacting non-PII.
    ("phone", r"(?<![\d-])(?:\+?\d{1,3}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b"),
]

_PLACEHOLDER = {name: f"<{name.upper()}>" for name, _ in PII_PATTERNS}


def pii_counts(text: Column | str) -> list[Column]:
    """One ``n_<class>`` count column per PII class (aliased)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]


def redact_pii(text: Column | str) -> Column:
    """Text with every PII match replaced by its class placeholder,
    classes applied in :data:`PII_PATTERNS` order."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, _PLACEHOLDER[name])
    return c


def redaction_report(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, redacted, n_email, n_ip, n_card, n_ssn, n_phone, clean)
    — the scrub stage of a curation funnel: downstream keeps
    ``redacted`` (or drops rows above a count threshold), metrics roll
    up the per-class counts per source. Single scan, all codegen."""
    c = F.col(text_col)
    counted = docs.select(id_col, redact_pii(c).alias("redacted"), *pii_counts(c))
    # derive `clean` from the already-computed count ATTRIBUTES — an
    # inline sum of regexp_count calls would run all five regexes a
    # second time per row (they dominate the stage's cost)
    total = sum(
        (F.col(f"n_{name}") for name, _ in PII_PATTERNS), F.lit(0)
    )
    return counted.select("*", (total == 0).alias("clean"))
