"""Paragraph-level exact deduplication (C10 extension, the Dolma
shape): remove every LATER occurrence of an exact-duplicate paragraph
across the whole corpus — boilerplate headers, license blocks,
navigation chrome — while keeping each document's surviving
paragraphs in their original order. Document-level exact dedup
(operators/dedup.py:exact_dedup) removes whole copies; this removes
the repeated fragments INSIDE otherwise-distinct documents, which at
web scale is most of the duplication by byte.

Semantics: a paragraph's identity is md5 of its exact text; the
keeper is the globally FIRST occurrence by (doc_id, paragraph index)
— deterministic, engine-replicable (the same min-id convention as
every dedup tier). Paragraphs shorter than ``min_chars`` are EXEMPT
(always kept): one-word bullets and blank separators repeat in any
healthy corpus and dropping them would shred documents — the same
short-circuit Dolma applies.

Scale shape: one explode; the keep-first decision is one shuffle on
the paragraph hash with BOUNDED per-key state (min(struct) partial-
aggregates map-side — the boilerplate paragraph repeated millions of
times is exactly the hottest key, and it folds to one struct per
partition); the keeper join streams dup rows past one keeper row
(AQE splits skew); the rebuild is one doc_id agg whose buffer is
bounded by the document's own size. No UDFs — split, hash, sort and
rejoin are all codegen.

DuckDB twin in queries/lm.py:q_paragraph_dedup (row_number-over-hash
formulation — identical keep-first set).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(docs: DataFrame, sep: str = "\n\n",
                     id_col: str = "doc_id", text_col: str = "text",
                     min_chars: int = 1) -> DataFrame:
    """(id_col, text, n_kept, n_dropped): the corpus with duplicate
    paragraphs removed and documents reassembled with ``sep``. A
    document whose every paragraph was removed keeps its row with
    empty text (loss is visible, not a silent drop); null-text
    documents pass through with 0/0 counts."""
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")
    # F.split takes a Java regex: quote the separator so "." or "|"
    # separators split literally
    pat = re.escape(sep)
    # scale-adaptive repartition before the paragraph explode +
    # per-paragraph md5 (functions/spread.py; r14 optimization round)
    from ..functions.spread import spread

    paras = spread(
        docs.where(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.col(text_col)
        )
    ).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat, -1)).alias(
            "idx", "para"
        ),
    )
    eligible = F.length("para") >= min_chars
    keyed = paras.withColumn("__k", F.md5("para"))
    first = (
        keyed.where(eligible)
        .groupBy("__k")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__first")
        )
    )
    kept = (
        keyed.join(first, "__k", "left")
        .where(
            ~eligible
            | (F.struct(F.col(id_col), F.col("idx")) == F.col("__first"))
        )
    )
    dropped = (
        keyed.join(first, "__k")
        .where(
            eligible
            & (F.struct(F.col(id_col), F.col("idx")) != F.col("__first"))
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dropped"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("para")))
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias(text_col),
        F.count("*").cast("long").alias("n_kept"),
    )
    base = docs.select(id_col).join(rebuilt, id_col, "left").join(
        dropped, id_col, "left"
    )
    return base.select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias(
            "n_dropped"
        ),
    )
