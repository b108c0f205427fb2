"""Distributed vocabulary building (C13 adjunct): the token-frequency
table every tokenizer training / frequency-filter step starts from.

One explode + one hash count over the corpus, then a deterministic
top-``max_size`` truncation (count desc, token asc — replays and
engine versions produce the identical vocabulary) annotated with the
running COVERAGE fraction: vocab[i].coverage = fraction of all token
occurrences covered by ranks 1..i. Coverage is what practitioners
actually size vocabularies by ("smallest V covering 99.5%"), and
computing it inside the same plan costs one extra window over the
already-tiny truncated table.

Scale shape: the explode produces corpus-token rows but aggregates
map-side into per-partition (token, count) partials before the single
shuffle; the top-K is TakeOrdered (per-partition heaps, driver merge
of K), never a global sort of the frequency table. For corpora whose
TAIL must also be bounded (the frequency table itself too large to
sort), cap it first with operators/heavy_hitters.py summaries — same
counts, explicit error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def build_vocabulary(docs: DataFrame, max_size: int,
                     text_col: str = "text") -> DataFrame:
    """(rank, token, n, coverage) — the ``max_size`` most frequent
    tokens with cumulative occurrence coverage in [0, 1]."""
    if max_size < 1:
        raise ValueError(f"max_size must be >= 1, got {max_size}")
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_size)
    total = counts.agg(F.sum("n").alias("__t"))
    w = (
        Window.orderBy(F.desc("n"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the window runs over <= max_size rows (post-truncation), so the
    # single-partition sort it implies is bounded by design
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("token")))
            .alias("rank"),
            "token",
            "n",
            (F.sum("n").over(w) / F.col("__t")).alias("coverage"),
        )
    )


def oov_rate(docs: DataFrame, vocab: DataFrame,
             text_col: str = "text") -> DataFrame:
    """Per-document out-of-vocabulary token fraction — the acceptance
    check for a candidate vocabulary against a held-out corpus. One
    explode + one broadcast semi-probe (the vocab is small by
    construction); null/empty documents report 0 tokens, OOV 0.0."""
    toks = docs.select(
        "doc_id", F.explode_outer(tokens(text_col)).alias("token")
    )
    hit = toks.join(
        F.broadcast(vocab.select("token").withColumn("__in", F.lit(1))),
        "token",
        "left",
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.when(F.col("token").isNotNull()
                       & (F.col("token") != ""), 1)).alias("n_tokens"),
        F.coalesce(
            F.count(
                F.when(
                    F.col("token").isNotNull()
                    & (F.col("token") != "")
                    & F.col("__in").isNull(),
                    1,
                )
            ).cast("double")
            / F.nullif(
                F.count(
                    F.when(
                        F.col("token").isNotNull() & (F.col("token") != ""),
                        1,
                    )
                ).cast("double"),
                F.lit(0.0),
            ),
            F.lit(0.0),
        ).alias("oov_frac"),
    )


def unigram_logprob_score(docs: DataFrame, vocab: DataFrame,
                          text_col: str = "text",
                          oov_logprob: float = -20.0) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap tier of
    the LM-perplexity quality filter (CCNet-style pipelines bucket
    documents by LM score; a unigram model needs only the vocabulary
    table, no trained model). Gibberish, boilerplate-free noise and
    wrong-language text all score low because their tokens are rare or
    absent in the corpus-wide vocabulary.

    p(token) = n / total over the FULL vocabulary table (pass an
    untruncated build_vocabulary output; a truncated one makes the
    tail OOV, which the score then punishes at ``oov_logprob`` — the
    standard floor for unseen tokens). One explode_outer + one
    broadcast model join + one doc_id aggregation — token-free
    (null/empty) documents ride the same pass via their null token row
    and surface with a NULL score and 0 tokens, with no completion
    join back to the doc list (an earlier draft joined scores back to
    docs on doc_id: both sides are O(docs), so that join shuffles
    twice and cannot broadcast — the conditional aggregate gets the
    same semantics for one shuffle)."""
    total = vocab.agg(F.sum("n").alias("__t"))
    model = F.broadcast(
        vocab.crossJoin(F.broadcast(total)).select(
            "token",
            F.log(F.col("n").cast("double") / F.col("__t")).alias("__lp"),
        )
    )
    toks = docs.select(
        "doc_id", F.explode_outer(tokens(text_col)).alias("token")
    )
    scored = toks.join(model, "token", "left")
    real = F.col("token").isNotNull() & (F.col("token") != "")
    return scored.groupBy("doc_id").agg(
        F.avg(
            F.when(real, F.coalesce(F.col("__lp"), F.lit(oov_logprob)))
        ).alias("mean_logprob"),
        F.count(F.when(real, 1)).alias("n_tokens"),
    )
