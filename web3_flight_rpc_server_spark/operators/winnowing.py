"""Winnowing document fingerprints (rolling-hash selection; the
MOSS/Schleimer-Wilkerson-Aiken scheme) — north-star C13 fingerprinting.

Per document: hash every character k-gram, slide a window of w hashes,
keep each window's minimum. Guarantees: any shared substring of length
>= w + k - 1 contributes at least one shared fingerprint, so document
overlap detection needs only a fingerprint-set join — the same
explode -> join shape as the shingle tiers, but robust to token
boundaries (plagiarism/quote detection rather than whole-doc near-dup).

All built-in expressions: substring/xxhash64 inside transform over an
ATTRIBUTE column (cheap per-position access — the HOF re-evaluation
pitfall only bites when the lambda references an expression tree).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _persisted


def winnow_fingerprints(docs: DataFrame, k: int = 12, w: int = 6,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        hash_fn: Callable[[Column], Column] | None = None,
                        ) -> DataFrame:
    """(id, fingerprints: array<bigint> distinct winnowed hashes).

    Defaults (k=12, w=6) target substring matches of >= 17 chars —
    short k on a repetitive vocabulary makes every document share
    fingerprints and the downstream pair join quadratic.

    ``hash_fn`` defaults to xxhash64 (production tier); pass
    ``functions.hashing.md5_prefix60`` for the oracle-bridge tier
    DuckDB reproduces bit-for-bit."""
    hash_fn = hash_fn or (lambda c: F.xxhash64(c))
    # Materialize lower(text) as an ATTRIBUTE before the k-gram
    # lambda: HOF lambdas are interpreted with no common-subexpression
    # elimination, so substring(lower(text), i, k) inside the lambda
    # would re-lowercase the WHOLE document at every gram position —
    # O(len^2) per doc. The repartition doubles as the projection
    # barrier that keeps the lowered column materialized.
    spread = docs.select(
        id_col, F.lower(F.col(text_col)).alias("__lt")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    text = F.col("__lt")
    # k-gram rolling hashes; empty when the doc is shorter than k
    n_grams = F.length(text) - (k - 1)
    grams = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    hashed = spread.select(
        id_col,
        F.transform(grams, lambda i: hash_fn(F.substring(text, i, k))).alias("hs"),
    )
    # Windowed minima as a fold of w SHIFTED SLICES zipped with
    # least() — the word_shingles trick: each zip_with touches already
    # materialized arrays, so the whole minima pass costs O(w) array
    # traversals per doc. The direct shape — transform(windows, j ->
    # array_min(slice(hs, j, w))) — runs an interpreted slice+min per
    # WINDOW, O(n*w) lambda evaluations per doc (measured ~1.3x slower
    # end-to-end on the sf1 pair pipeline: 5.9 s -> 4.4-5.0 s warm,
    # identical output).
    m = F.size("hs") - (w - 1)  # window count when size >= w
    acc = F.slice("hs", 1, m)
    for j in range(1, w):
        acc = F.zip_with(
            acc, F.slice("hs", j + 1, m), lambda a, b: F.least(a, b)
        )
    minima = F.when(m >= 1, acc).otherwise(F.array().cast("array<bigint>"))
    return hashed.select(
        id_col, F.array_distinct(minima).alias("fingerprints")
    )


def fingerprint_overlap_pairs(docs: DataFrame, min_shared: int = 3,
                              k: int = 12, w: int = 6, max_df: int = 50,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              hash_fn: Callable[[Column], Column] | None = None,
                              ) -> DataFrame:
    """Pairs sharing >= min_shared winnowed fingerprints (d1 < d2) —
    substring-overlap candidates.

    max_df drops "stop fingerprints" (present in more than max_df
    docs) BEFORE the self-join: a fingerprint shared by m documents
    contributes m^2/2 pairs, so ubiquitous substrings — boilerplate,
    license headers, common phrases — are exactly the join skew that
    must be capped at scale; they carry no pair-discrimination signal
    anyway."""
    # persist the fingerprint ARRAYS before exploding: explode
    # re-evaluates its generator expression per output element, so an
    # unmaterialized winnow expression would be recomputed ~|fps|
    # times per doc (measured 50x slowdown).
    arrays = _persisted(
        winnow_fingerprints(docs, k, w, id_col, text_col, hash_fn)
    )
    fp = arrays.select(id_col, F.explode("fingerprints").alias("fp"))
    rare = fp.groupBy("fp").agg(F.count("*").alias("df")).where(
        F.col("df") <= max_df
    )
    fp_rare = fp.join(rare.select("fp"), "fp")
    a, b = fp_rare.alias("a"), fp_rare.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
