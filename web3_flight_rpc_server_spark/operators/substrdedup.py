"""Exact substring deduplication with REMOVAL semantics (the Lee et
al. 2022 "Deduplicating Training Data Makes Language Models Better"
ExactSubstr tier): remove every later occurrence of a long exact token
span repeated anywhere in the corpus — across documents or within one
— keeping exactly one copy. This is the granularity between
paragraph-level exact dedup (operators/paradedup.py — cuts only at
structural separators) and winnowing overlap DETECTION
(operators/winnowing.py — reports pairs, removes nothing): spans that
straddle paragraph boundaries, boilerplate injected mid-sentence, and
long quoted passages all fall through paradedup and land here.

Semantics
---------
* The unit is the literal-single-space token: ``split(text, ' ')``
  re-joined with ``' '`` is the identity for ANY input, so
  reconstruction is exact without storing character offsets.
* A *window* is k consecutive tokens (stride 1); its identity is md5
  of its exact text (the tokens joined with ' ' — i.e. the original
  character span). A window is *duplicated* if its text occurs >= 2
  times corpus-wide.
* The *keeper* occurrence of each duplicated window is the globally
  first by (doc_id, pos) — the same deterministic min-struct
  convention as every other dedup tier.
* A token is REMOVED iff it is covered by at least one non-keeper
  occurrence of a duplicated window AND by no keeper occurrence.
  Keeper coverage is what guarantees exactly one copy of every
  duplicated span survives (without it, self-overlapping repeats —
  "x x x x ..." — would eat the keeper too); overlapping and
  adjacent duplicated windows merge into maximal removed spans
  implicitly through position-level marking, which is Lee et al.'s
  merge-adjacent step without an explicit interval pass.
* Duplicated spans SHORTER than k tokens never form a full window and
  are untouched — k is the minimum removable span length, exactly the
  paper's >= 50-token threshold knob.
* Surviving tokens are reassembled in original order; documents whose
  every token was removed keep their row with empty text (loss is
  visible, not a silent drop); null-text documents pass through 0/0.

Scale shape
-----------
Suffix arrays (the paper's machinery) don't distribute; this is the
fixed-stride-window formulation: one projection builds all window
hashes inside array land (transform over sequence — no O(n^2) row
blowup from carrying the token array through an explode), O(n*k)
bytes hashed — a constant 20-50x factor on a linear, shuffle-free,
embarrassingly-parallel map pass (the same per-position cost shape
as winnowing's k-gram hashing; a true O(1)-per-window polynomial
rolling hash needs wrap-around long arithmetic, which Spark 4's
ANSI overflow semantics make a poor codegen fit — documented trade,
not an oversight); the duplicate decision is one shuffle on the window hash
with bounded per-key state (count + min(struct) fold map-side — the
boilerplate span repeated millions of times is the hottest key and
folds to one struct per partition); ONLY duplicated occurrences
explode into per-token coverage (k rows each — cost proportional to
duplicated volume, not corpus volume); the rebuild is one doc_id agg
whose buffer is bounded by the document's own size. No UDFs — split,
transform, hash, join and rebuild are all codegen.

DuckDB twin: queries/dedup.py:q_substring_dedup (row_number-over-hash
keep-first + generate_series coverage — identical removed set).
Reference anchor: SURVEY.md C10 north-star row; the reference repo
(Java server + `notebooks/ethereum_data_analysis.ipynb`) has no dedup
tier at all — this is LLM-pipeline capability beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_substrings(docs: DataFrame, k: int = 50,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id_col, text, n_kept, n_dropped): the corpus with every later
    occurrence of a duplicated >=k-token span removed and documents
    reassembled from their surviving tokens. ``n_kept``/``n_dropped``
    count TOKENS (the removal unit here), unlike paradedup's
    paragraph counts."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (a 1-token window would "
                         f"remove every repeated word), got {k}")
    toks_arr = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ", -1).alias("__t")
    )
    # All window (pos, hash) pairs built inside one array projection:
    # hashing the joined slice keys the window on its exact character
    # span (the literal-space convention makes them the same thing).
    occ = (
        toks_arr.where(F.size("__t") >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - k),
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        F.md5(
                            F.array_join(F.slice("__t", i + 1, k), " ")
                        ).alias("h"),
                    ),
                )
            ).alias("__w"),
        )
        .select(id_col, F.col("__w.pos").alias("pos"),
                F.col("__w.h").alias("h"))
    )
    # occ feeds BOTH the keep-first aggregate and the join probe, so
    # the plan runs the window-hash projection twice — MEASURED as the
    # right trade: persisting it on the cache ledger was 18% faster at
    # sf1 but 34% SLOWER at sf10 (31.5 -> 42.2 s warm), because
    # materializing corpus-sized (id, pos, md5) rows costs more than
    # recomputing a shuffle-free map pass; recompute wins at the scale
    # that matters (BASELINE.md r12).
    dup_first = (
        occ.groupBy("h")
        .agg(
            F.count("*").alias("__c"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"),
        )
        .where(F.col("__c") >= 2)
        .select("h", "__first")
    )
    dup_occ = occ.join(dup_first, "h").select(
        id_col,
        "pos",
        (F.struct(F.col(id_col), F.col("pos")) == F.col("__first")).alias(
            "is_keeper"
        ),
    )
    # Position-level coverage: explode only the duplicated occurrences.
    removed = (
        dup_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tp"),
            "is_keeper",
        )
        .groupBy(id_col, "tp")
        .agg(F.max("is_keeper").alias("__prot"))
        .where(~F.col("__prot"))
        .select(id_col, "tp")
    )
    toks = toks_arr.select(
        id_col, F.posexplode("__t").alias("tp", "tok")
    )
    kept = toks.join(removed, [id_col, "tp"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tp"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias(text_col),
        F.count("*").cast("long").alias("n_kept"),
    )
    dropped = removed.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dropped")
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
