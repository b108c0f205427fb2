"""Text normalization: the pre-tokenization cleanup pass every
corpus pipeline runs before fingerprinting/dedup (north-star C13
adjunct — dirty whitespace and control bytes make byte-identical
documents hash differently, silently defeating exact dedup).

All pure built-in regexp/string expressions (JVM codegen, no UDFs),
applied in a FIXED order so normalization is deterministic and
engine-reproducible (DuckDB twin below):

    1. strip C0/C1 control characters (except \\t \\n \\r)
    2. normalize all whitespace runs (incl. tabs/newlines) to one
       space — token boundaries survive, layout noise does not
    3. trim leading/trailing space
    4. optional lowercase (the dedup tiers already lowercase in
       tokens(); normalizing earlier makes raw-text exact dedup
       case-insensitive too)

Unicode NFC/NFKC folding needs ICU-class tables; Spark has no
built-in for it and a per-row Python pass is the slow path, so it is
deliberately out of scope here — the regexp class above covers the
control/whitespace noise that dominates web-scraped corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 (except \t \n \r) + DEL + C1
_CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]"
_WS_RUN = r"\s+"


def normalize_text(c: Column | str, lowercase: bool = False) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, _CONTROL_CLASS, "")
    out = F.regexp_replace(out, _WS_RUN, " ")
    out = F.trim(out)
    if lowercase:
        out = F.lower(out)
    return out


def normalize_sql(expr: str, lowercase: bool = False) -> str:
    """DuckDB twin (RE2 syntax accepts the same classes)."""
    out = f"regexp_replace({expr}, '{_CONTROL_CLASS}', '', 'g')"
    out = f"regexp_replace({out}, '\\s+', ' ', 'g')"
    out = f"trim({out})"
    if lowercase:
        out = f"lower({out})"
    return out


def normalize_documents(docs: DataFrame, text_col: str = "text",
                        lowercase: bool = False) -> DataFrame:
    """Documents with ``text`` normalized in place plus a
    ``was_dirty`` flag (rows the pass actually changed — the
    monitoring signal for how noisy a source is)."""
    norm = normalize_text(text_col, lowercase)
    # eqNullSafe: null text normalizes to null and counts as clean
    return docs.withColumn("__norm", norm).select(
        *[c for c in docs.columns if c != text_col],
        F.col("__norm").alias(text_col),
        (~F.col("__norm").eqNullSafe(F.col(text_col))).alias("was_dirty"),
    )
