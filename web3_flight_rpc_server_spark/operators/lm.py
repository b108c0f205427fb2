"""Conditional n-gram language model + DSIR importance resampling
(C13/C19 extensions): the two LM-based data-curation tiers above the
unigram score that already lives in operators/vocab.py.

1. **Bigram LM with add-k smoothing + per-document perplexity** — the
   CCNet-style quality filter's real model tier (Wenzek et al. 2020
   bucket documents by LM perplexity; vocab.unigram_logprob_score is
   the model-free cheap tier, this is the trained conditional one).
   Training is two hash aggregations over exploded bigrams; scoring is
   one join of the document's bigrams against the counts tables. No
   UDFs anywhere — the log-probability arithmetic is plain column
   expressions, so the whole pass stays inside whole-stage codegen.

2. **DSIR importance resampling** (Xie et al. 2023, "Data Selection
   for Language Models via Importance Resampling") — select
   pretraining data that matches a small TARGET distribution by
   reweighting the raw pool with hashed-n-gram bag-of-words importance
   weights, then Gumbel-top-k sampling. The point of DSIR at 100 TB is
   that the model is a B-bucket multinomial (B ~ 10^4): the fitted
   log-ratio table is broadcast-sized NO MATTER how large the corpora
   are, so scoring is explode -> broadcast join -> per-doc sum, with
   no shuffle join against any corpus-sized table.

Scale shape:
- ``bigram_lm_fit``: one explode + groupBy(w1, w2) with map-side
  partials (one shuffle, keyed on the bigram — zipfian head keys are
  AQE-skew-split); contexts derive from the bigram table by a second,
  smaller agg, so c(w1) == sum_w2 c(w1, w2) holds by construction.
- ``perplexity_score``: the only corpus x model join keys on
  (w1, w2); the context join keys on w1 (vocab-sized, broadcast when
  small — left to AQE's size estimate). Everything else is map-side.
- ``dsir_log_weights``: the lambda (log-ratio) table has exactly
  ``buckets`` rows and is broadcast explicitly; per-doc weights are
  one explode + one doc_id agg.
- ``dsir_resample``: deterministic Gumbel top-k via the md5-bridge
  uniform (operators/mixture.py convention) — TakeOrdered per-
  partition heaps, never a global sort; reproducible across runs,
  partitionings, and engines.

The md5-bridge hash (functions/hashing.py) keeps every step
bit-replicable in DuckDB, so both tiers admit full value-hash oracles
(queries/lm.py). No counterpart in the reference (its notebook stops
at value_counts-style aggregation); these extend the pretraining-
pipeline surface the way packing/mixture/BPE did.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_prefix60
from ..functions.text import tokens

# [0, 1) uniform denominator for the 60-bit md5 bridge
_DENOM = float(1 << 60)

_EMPTY_PAIRS = "array<struct<w1:string,w2:string>>"


def _clean_tokens(text_col: str) -> F.Column:
    """Lowercased whitespace tokens with empties dropped (double
    spaces / leading separators), matching the vocab/q_vocab contract
    so all LM tiers share one tokenization."""
    return F.filter(tokens(text_col), lambda t: t != "")


def _spread(docs: DataFrame) -> DataFrame:
    """Scale-adaptive round-robin before an explode-heavy pass (r14
    optimization round — the shingle_sets move, applied to the LM
    tiers, gated on the plan-time size estimate so a tiny corpus
    skips the exchange). See functions/spread.py for the measured
    rationale (9.2 -> 1.2 s for the DSIR feature pass at sf1; +0.4 s
    regression at sf0.1 when unconditional)."""
    from ..functions.spread import spread

    return spread(docs)


def bigram_pairs(text_col: str = "text") -> F.Column:
    """array<struct<w1,w2>> of adjacent-token pairs; empty array below
    two tokens. Built from two shifted slices (see
    functions/text.py:word_shingles for why slices, not
    transform(sequence) — higher-order lambdas re-evaluate their
    source expression per element)."""
    toks = _clean_tokens(text_col)
    m = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast(_EMPTY_PAIRS)
    )


@dataclass(frozen=True)
class BigramLM:
    """Fitted model as three (distributed) tables — nothing is ever
    collected, so fitting works at any corpus size:

    - ``bigrams``:  (w1, w2, n2)  bigram occurrence counts
    - ``contexts``: (w1, n1)      history counts, n1 = sum_w2 n2
    - ``vsize``:    one row (v)   distinct-token vocabulary size
    """

    bigrams: DataFrame
    contexts: DataFrame
    vsize: DataFrame
    add_k: float


def bigram_lm_fit(docs: DataFrame, text_col: str = "text",
                  add_k: float = 0.5) -> BigramLM:
    """Train the add-k-smoothed bigram model:

        p(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)

    Interior bigrams only (no BOS/EOS padding — the perplexity filter
    compares documents against each other, where the boundary terms
    are a per-doc constant that washes out of the mean).

    The aggregated ``bigrams`` table is PERSISTED (the shared cache
    ledger — callers release via ``release_caches()``): it is the
    model, and unpersisted the fit's corpus bigram explode ran TWICE
    inside one scoring action — once under the bigram-prob join and
    once again under ``contexts``' re-aggregation (no exchange reuse
    across the two branches; plan-verified, r14 optimization round).
    With the cache, ``contexts`` folds the model table instead of
    re-exploding the corpus: 4 -> 3 corpus Generates per
    fit-and-score execution. At 100 TB the table is the distinct-
    bigram type count (Zipf heavy-tailed but far below token
    occurrences); MEMORY_AND_DISK spills it rather than re-paying a
    full corpus explode + aggregation per consumer."""
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    from .dedup import _persisted

    spread = _spread(docs.select(text_col))
    pairs = spread.select(
        F.explode(bigram_pairs(text_col)).alias("pr")
    ).select("pr.w1", "pr.w2")
    bigrams = _persisted(
        pairs.groupBy("w1", "w2").agg(
            F.count("*").cast("double").alias("n2")
        )
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("n2").alias("n1"))
    vsize = (
        spread.select(F.explode(_clean_tokens(text_col)).alias("token"))
        .agg(F.count_distinct("token").cast("double").alias("v"))
    )
    return BigramLM(bigrams, contexts, vsize, add_k)


def perplexity_score(docs: DataFrame, lm: BigramLM,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document perplexity under the fitted bigram model:

        ppl = exp(-mean over bigrams of ln p(w2 | w1))

    Returns (id_col, n_bigrams, ppl); documents with fewer than two
    tokens keep their row with n_bigrams = 0 and NULL ppl (the
    explode_outer null-row pattern from vocab.unigram_logprob_score —
    no completion join back to the doc list). Unseen bigrams over a
    seen history cost (0 + k) / (n1 + kV); an entirely unseen history
    degenerates to the uniform 1/V. All column arithmetic — the scan,
    both joins and the final agg stay in codegen."""
    pairs = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode_outer(bigram_pairs(text_col)).alias("pr"),
    ).select(id_col, "pr.w1", "pr.w2")
    scored = (
        pairs.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.contexts, ["w1"], "left")
        .crossJoin(F.broadcast(lm.vsize))
    )
    k = F.lit(float(lm.add_k))
    logp = F.log(
        (F.coalesce(F.col("n2"), F.lit(0.0)) + k)
        / (F.coalesce(F.col("n1"), F.lit(0.0)) + k * F.col("v"))
    )
    real = F.col("w1").isNotNull()
    return scored.groupBy(id_col).agg(
        F.count(F.when(real, 1)).alias("n_bigrams"),
        F.exp(-F.avg(F.when(real, logp))).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# DSIR: hashed-n-gram importance resampling
# ---------------------------------------------------------------------------


def hashed_features(docs: DataFrame, buckets: int,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    hasher: str = "xxhash64",
                    spread: bool = True) -> DataFrame:
    """(id_col, b): one row per token occurrence and per adjacent-pair
    occurrence, hashed into ``buckets`` — DSIR's unigram+bigram
    bag-of-words feature map.

    ``hasher`` follows the fingerprint operators' two-tier convention
    (functions/hashing.py): ``"xxhash64"`` (default) is the production
    hash — one JVM codegen call, measured ~10x cheaper than the bridge
    on the feature firehose (+0.4 s vs +4.3 s per 25M-feature pass at
    sf1); ``"md5"`` is the oracle-bridge tier the q_dsir /
    q_quality_score declared artifacts use so DuckDB can recompute
    the identical buckets. Bucket QUALITY is equivalent (both uniform);
    only cross-engine replicability differs. Training and scoring must
    use the same hasher — the classifier stores its choice nowhere,
    by the same caller's-contract as the fingerprint ops.

    ``spread`` round-robins the input first (see _spread) so the
    feature explode parallelizes past the 1-2 scan partitions of a
    compact corpus; callers that already repartitioned BY KEY (the
    classifier fits/scorers, whose downstream (id, b) and id
    aggregations ride that exchange) pass False to keep their
    partitioning."""
    if spread:
        docs = _spread(docs.select(id_col, text_col))
    toks = _clean_tokens(text_col)
    feats = F.concat(
        toks,
        F.transform(
            bigram_pairs(text_col),
            lambda p: F.concat(p["w1"], F.lit(" "), p["w2"]),
        ),
    )
    if hasher == "md5":
        b = md5_prefix60(F.col("f")) % F.lit(buckets)
    elif hasher == "xxhash64":
        b = F.pmod(F.xxhash64(F.col("f")), F.lit(buckets))
    else:
        raise ValueError(f"unknown hasher: {hasher!r}")
    return docs.select(
        F.col(id_col), F.explode(feats).alias("f")
    ).select(id_col, b.alias("b"))


def dsir_log_weights(candidates: DataFrame, target: DataFrame,
                     buckets: int = 512, smoothing: float = 1.0,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     hasher: str = "xxhash64",
                     target_within: bool = False) -> DataFrame:
    """Per-candidate log importance weight

        ln w(x) = sum over x's feature occurrences of
                  [ln p_target(b) - ln p_raw(b)]

    where both multinomials are add-``smoothing`` estimates over the
    ``buckets`` hash buckets, p_raw fitted on the candidate pool
    itself and p_target on the (much smaller) target corpus. Only
    documents with at least one feature (>= 1 token) appear — a
    token-free document has no bag to weigh.

    The fitted model is the ``lambda_b`` log-ratio table: exactly
    ``buckets`` rows regardless of corpus size, broadcast to the
    scoring join — the whole reason DSIR scales to 100 TB pools.

    ``target_within=True`` declares that ``target`` is a SUBSET of
    ``candidates`` (the common DSIR deployment: the target is a
    labeled slice of the pool — q_dsir's lang='en'). The target
    multinomial then folds the already-persisted candidate feature
    table through a semi-join on the target's ids instead of
    re-tokenizing and re-hashing the target text — at 100 TB that
    removes a second feature pass over the target slice (41% of the
    corpus in the bench fixture). Identical counts by construction:
    the same (id, b) rows are aggregated either way (the DuckDB
    oracle computes the target multinomial exactly this way). With
    the default False, disjoint-target semantics are unchanged."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    from .dedup import _persisted

    a = F.lit(float(smoothing))
    ab = F.lit(float(smoothing) * buckets)

    # the candidate feature table feeds BOTH the raw multinomial and
    # the scoring join — unpersisted, the corpus-sized explode runs
    # twice (measured 25 s -> well under half at sf1). Registered on
    # the dedup cache ledger: hosts call release_caches() after the
    # consuming action, same contract as every dedup tier.
    cand_f = _persisted(hashed_features(candidates, buckets, id_col,
                                        text_col, hasher))
    if target_within:
        tgt_f = cand_f.join(
            target.select(id_col), id_col, "left_semi"
        )
    else:
        tgt_f = hashed_features(target, buckets, id_col, text_col,
                                hasher)

    raw_cnt = cand_f.groupBy("b").agg(
        F.count("*").cast("double").alias("cr")
    )
    tgt_cnt = tgt_f.groupBy("b").agg(
        F.count("*").cast("double").alias("ct")
    )
    spark = candidates.sparkSession
    all_b = spark.range(buckets).select(F.col("id").alias("b"))
    totals = (
        raw_cnt.agg(F.sum("cr").alias("tr"))
        .crossJoin(tgt_cnt.agg(F.sum("ct").alias("tt")))
    )
    lam = (
        all_b.join(tgt_cnt, "b", "left")
        .join(raw_cnt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0.0)) + a) / (F.col("tt") + ab))
                - F.log((F.coalesce("cr", F.lit(0.0)) + a) / (F.col("tr") + ab))
            ).alias("lam"),
        )
    )
    return cand_f.join(F.broadcast(lam), "b").groupBy(id_col).agg(
        F.sum("lam").alias("log_w")
    )


def gumbel_key(id_col: str, logw_col: str, seed: int) -> F.Column:
    """log w + Gumbel(0,1) noise from the md5-bridge uniform — the
    Gumbel-top-k trick makes taking the k largest keys an exact sample
    without replacement with P(x) proportional to w(x), and the
    hash-derived uniform makes the draw reproducible across runs,
    partitionings, and engines (same convention as mixture_sample's
    partial epochs)."""
    key = F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit("dsir"), F.lit(str(seed))
    )
    # (h + 0.5) / 2^60 lands strictly inside (0, 1): no ln(0)
    u = (md5_prefix60(key) + F.lit(0.5)) / F.lit(_DENOM)
    return F.col(logw_col) - F.log(-F.log(u))


def dsir_resample(weighted: DataFrame, k: int, seed: int = 7,
                  id_col: str = "doc_id",
                  logw_col: str = "log_w") -> DataFrame:
    """Gumbel-top-k selection of ``k`` documents from the weighted
    pool (columns of ``weighted`` pass through). orderBy + limit is
    TakeOrdered — per-partition k-heaps and a driver merge of k rows,
    not a global sort; the id tiebreak makes exact-tie order (and the
    oracle's) deterministic."""
    g = weighted.withColumn("__g", gumbel_key(id_col, logw_col, seed))
    return (
        g.orderBy(F.desc("__g"), F.asc(id_col))
        .limit(k)
        .drop("__g")
    )
