"""End-to-end corpus curation: the full pre-training data hygiene run
(C4/Dolma/RefinedWeb shape) composed from this engine's verified
operators, with per-stage reject accounting.

Stage order (a doc's reject_reason is its FIRST failing gate, matching
how production pipelines report funnel losses):

    1. lang        stopword-argmax language ID not in the allow-list
    2. quality     composite score (length saturation + lexical
                   diversity + punctuation penalty) below threshold
    3. exact_dup   not the min-id doc of its exact-text group
    4. near_dup    MinHash-LSH pairs -> connected components ->
                   not the canonical (min-id) doc of its cluster
    5. semantic_dup OPTIONAL (corpora with embeddings): SemDeDup
                   keep-set over the survivors' embeddings
                   (operators/semdedup.py) — not the canonical
                   (min-id) member of its semantic cluster; docs
                   without an embedding pass
    6. contaminated >= 50% 3-gram shingle overlap with the held-out
                   benchmark bucket
    7. blocklist   token set intersects the term blocklist

Scale shape: stages 1-2 and 6 are expression gates in the document
scan (no shuffle); stage 3 shuffles only (doc_id, md5(text)) pairs —
min-per-key then join-back, bounded per-key state, the document
payload never shuffles; stage 4 is the LSH candidate pipeline
(single signature shuffle, bucket join) plus O(diameter) component
rounds over the tiny pair graph; stage 5 broadcasts the DISTINCT
benchmark shingle set and probes it linearly. Later stages only see
earlier stages' survivors, so the expensive graph stages run on the
already-gated corpus. The reject map (doc_id, reason) is a small
fraction of the corpus and joins back on the key once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..functions.text import STOPWORDS, punct_count, stopword_hits, tokens
from ..operators.components import connected_components
from ..operators.dedup import (
    DEFAULT_MAX_BUCKET,
    _persisted,
    minhash_lsh_dedup_pairs,
)
from ..sources import tables

REJECT_ORDER = (
    "lang", "quality", "perplexity", "exact_dup", "near_dup",
    "semantic_dup", "contaminated", "blocklist",
)


@dataclass(frozen=True)
class CurationConfig:
    allowed_langs: tuple[str, ...] = ("en",)
    min_quality: float = 0.5
    neardup_threshold: float = 0.3
    contamination_frac: float = 0.5
    bench_bucket: int = 15
    blocklist: tuple[str, ...] = ("slow", "big")
    n_splits: int = 16
    holdout_splits: tuple[int, ...] = (0,)  # split bucket(s) -> "val"
    # Stateless repetition ceiling (streaming gate tier): fraction of
    # a doc's bigram occurrences that are duplicates, computed in-row
    # (1 - distinct/total). 1.0 admits everything. The exact modal-
    # bigram metrics are the batch q_repetition query; this bound is
    # the per-row approximation a stream can evaluate without state.
    max_dup_bigram_frac: float = 1.0
    # Semantic (SemDeDup) gate parameters — active only when the
    # caller passes an embeddings DataFrame to curation_rejects. The
    # default threshold is the SemDeDup production operating point
    # (cosine >= 0.9: near-identical content under paraphrase/format
    # noise that lexical n-grams miss); K/top_m are the blocking
    # capacity dials (operators/semdedup.py module docstring), and
    # semantic_max_cell opts in the exclude-and-ledger quarantine for
    # genuinely skewed embedding corpora — excluded cells mean those
    # semantic dups go UNDETECTED (admitted), the same
    # recall-loss-reported-not-hidden contract as lsh_max_bucket;
    # fetch the ledger via semantic_neardup_pairs(with_quarantine=...)
    # when auditing.
    semantic_threshold: float = 0.9
    semantic_n_cells: int = 8
    semantic_dim: int = 64
    semantic_top_m: int = 2
    semantic_max_cell: int | None = None
    # LM-perplexity gate (CCNet tier, operators/lm.py): reject docs
    # whose 4-decimal-rounded bigram perplexity exceeds the ceiling —
    # gibberish and wrong-register text the heuristic quality score
    # misses. None (default) disables the gate entirely; when active,
    # the model is the caller-passed ppl_model (a reference-corpus
    # BigramLM, the CCNet deployment shape) or, absent that, fit on
    # the quality-gate survivors themselves (self-scored: outliers
    # against the corpus's own distribution). Documents with fewer
    # than two tokens have no defined perplexity and PASS — the same
    # can't-judge-admits contract as the embeddings-absent semantic
    # gate.
    max_perplexity: float | None = None
    # Trained-classifier floor for the STREAMING gate tier
    # (pipelines/streaming_curation.py:gate_stream with a clf_model):
    # survivors need round4(sigmoid(margin)) >= this. None disables.
    # The batch funnel's trained tier is the perplexity gate above;
    # the classifier gate is the stateless in-row shape a stream can
    # evaluate (operators/classifier.py:classifier_score_expr,
    # damping="none" models).
    min_clf_score: float | None = None
    # Hot-bucket cap for the LSH tier's band-bucket join
    # (operators/dedup.py:lsh_candidate_pairs): a band bucket holding
    # m docs contributes m^2/2 candidates, and template-heavy corpora
    # concentrate thousands of near-identical-but-not-exact-equal docs
    # in single buckets even AFTER the exact-dup gate — the quadratic
    # skew of the flagship path at 100 TB. Buckets past the cap are
    # quarantined wholesale (audit via lsh_hot_buckets). The shared
    # DEFAULT_MAX_BUCKET (5000, operators/dedup.py) is far above any
    # bucket a healthy corpus produces (it bounds the in-bucket verify
    # at ~12.5M candidate rows per hot bucket) while still guarding the
    # pathological template case — and since r6 the standalone pair
    # operators default to the SAME cap; None disables.
    lsh_max_bucket: int | None = DEFAULT_MAX_BUCKET


def _lang_pred(toks) -> Column:
    hits = {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    return (
        F.when(best == 0, "unknown")
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"], hits["es"]), "en")
        .when(hits["de"] >= F.greatest(hits["fr"], hits["es"]), "de")
        .when(hits["fr"] >= hits["es"], "fr")
        .otherwise("es")
    )


def _lang_pred_hits() -> Column:
    """_lang_pred's argmax when-chain over PRE-MATERIALIZED
    ``__h_<lang>`` hit-count attributes (see the staged gate
    projection in curation_rejects) — attribute references are free
    to repeat, unlike the interpreted filter() lambdas _lang_pred
    inlines."""
    h = {lang: F.col(f"__h_{lang}") for lang in STOPWORDS}
    best = F.greatest(*h.values())
    return (
        F.when(best == 0, "unknown")
        .when(h["en"] >= F.greatest(h["de"], h["fr"], h["es"]), "en")
        .when(h["de"] >= F.greatest(h["fr"], h["es"]), "de")
        .when(h["fr"] >= h["es"], "fr")
        .otherwise("es")
    )


def _quality(text_col, toks) -> Column:
    n_chars = F.length(text_col).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    # translate-based count — the regex measured 38.5 s vs 1.0 s at
    # sf10 on CJK-bearing text; values identical (functions/text.py)
    n_punct = punct_count(text_col).cast("double")
    return (
        0.5 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.4 * (n_uniq / n_tokens)
        + 0.1 * (1.0 - F.least(10.0 * n_punct / n_chars, F.lit(1.0)))
    )


def curation_rejects(docs: DataFrame,
                     cfg: CurationConfig = CurationConfig(),
                     pairs_fn=None, with_quarantine: bool = False,
                     embeddings: DataFrame | None = None,
                     ppl_model=None,
                     langid_model_df: DataFrame | None = None):
    """(doc_id, reject_reason) for every rejected doc — the funnel's
    loss ledger. Docs absent from the result survive every gate.

    ``pairs_fn(docs) -> (d1, d2, ...)`` overrides near-dup candidate
    generation: default is MinHash-LSH — the scale path, and what the
    declared q_curation_funnel runs; the exact-Jaccard tier
    (ngram_jaccard_pairs) remains available as the ground-truth
    pairs_fn (q_curation_semantic passes it so its two-closure oracle
    compares against exact pairs). The quality gate compares the
    4-decimal-rounded score, keeping the threshold decision identical
    across engines.

    ``embeddings`` (doc_id, embedding) activates the OPTIONAL
    semantic_dup gate between near_dup and contaminated: the SemDeDup
    keep-set (operators/semdedup.py:semantic_dedup_keep, min-id
    canonical — the same choice as every dedup tier) computed over
    the near_dup SURVIVORS' embeddings only (stage scoping: a doc
    already rejected lexically cannot drag its semantic twin down),
    under cfg.semantic_* (threshold/K/top_m/max_cell). Docs without
    an embedding row pass the gate — the funnel can't judge what it
    can't see, and says so by admitting rather than silently
    dropping. First-failing-gate ledger semantics are unchanged
    (pinned per-doc against the _semantic_keep_oracle-reusing DuckDB
    twin in tests/test_curation.py).

    ``with_quarantine=True`` returns ``(rejects, quarantine)`` where
    quarantine is the LSH hot-bucket ledger (band, bucket, n_docs) the
    near-dup stage excluded under ``cfg.lsh_max_bucket`` — derived
    from the SAME persisted shingle sets and default banding the pair
    join used, so the ledger and the join always agree. Quarantined
    docs are ADMITTED (their near-dups go undetected in those
    buckets): an honest funnel reports that recall loss instead of
    hiding it in a silent drop. None when the exact tier (pairs_fn)
    runs or the cap is disabled."""
    toks = tokens("text")
    # The funnel's stage branches all derive from this projection; at
    # 100 TB each branch would otherwise re-scan the corpus (14 scans
    # measured in the unpersisted plan), so persist it once — the gate
    # flags are a tiny fraction of the doc payload. Handle tracked by
    # operators.dedup's cache ledger; hosts call release_caches()
    # after the consuming action.
    #
    # ``langid_model_df`` (a persisted SoftmaxModel table,
    # operators/classifier.py:softmax_fit) opts the lang gate into the
    # TRAINED multiclass lang-id — the CCNet deployment shape: the
    # fastText-style scorer's argmax replaces the stopword-argmax
    # heuristic. One broadcast-sized model join per corpus scan; the
    # first-failing-gate ledger semantics are identical either way.
    # The gate projection is built in STAGED Projects over a
    # scale-adaptively spread scan (r14 optimization round — the
    # q_text_stats shape): the token array materializes once as an
    # attribute, then the 4 per-language stopword hit counts in their
    # own Project, then the argmax when-chain over those attributes.
    # Inlined, every reference to a hit count re-ran the interpreted
    # filter() lambda (and through it the split) per row — measured
    # 3.3 -> 1.0 s cold at sf0.1 and, with the spread past the 1-2
    # scan partitions, 5.8 -> 3.2 s steady at sf1. Byte-identical
    # output (verified corpus-wide at both SFs).
    from ..functions.spread import spread

    toked = spread(docs.select("doc_id", "text")).select(
        "doc_id", "text", toks.alias("__toks")
    )
    mtoks = F.col("__toks")
    if langid_model_df is not None:
        from ..operators.classifier import langid_score

        pred = langid_score(docs, langid_model_df).select(
            "doc_id", F.col("lang").alias("__lang")
        )
        lang_src = toked.select(
            "doc_id",
            "text",
            round4(_quality(F.col("text"), mtoks)).alias("__q"),
            F.arrays_overlap(
                mtoks, F.array(*[F.lit(w) for w in cfg.blocklist])
            ).alias("__blocked"),
        ).join(pred, "doc_id")
        feats = _persisted(lang_src)
    else:
        hits = toked.select(
            "*",
            *[
                stopword_hits(mtoks, lang).alias(f"__h_{lang}")
                for lang in STOPWORDS
            ],
        )
        feats = _persisted(
            hits.select(
                "doc_id",
                "text",
                _lang_pred_hits().alias("__lang"),
                round4(_quality(F.col("text"), mtoks)).alias("__q"),
                F.arrays_overlap(
                    mtoks, F.array(*[F.lit(w) for w in cfg.blocklist])
                ).alias("__blocked"),
            )
        )

    lang_bad = feats.where(
        ~F.col("__lang").isin(*cfg.allowed_langs)
    ).select("doc_id", F.lit("lang").alias("reject_reason"))
    s1 = feats.where(F.col("__lang").isin(*cfg.allowed_langs))

    qual_bad = s1.where(F.col("__q") < cfg.min_quality).select(
        "doc_id", F.lit("quality").alias("reject_reason")
    )
    s2 = s1.where(F.col("__q") >= cfg.min_quality)

    # LM-perplexity gate (optional, CCNet tier): score the quality
    # survivors under ppl_model (or a model fit on those survivors —
    # stage scoping: lang/quality rejects neither train nor drag down
    # the distribution). round4 keeps the threshold decision identical
    # across engines, like the quality gate; NULL ppl (< 2 tokens)
    # fails the > comparison and passes.
    if cfg.max_perplexity is not None:
        from ..operators.lm import bigram_lm_fit, perplexity_score

        base2 = s2.select("doc_id", "text")
        lm = ppl_model if ppl_model is not None else bigram_lm_fit(base2)
        # persisted: the loser set feeds BOTH the s2 anti-join (so
        # every downstream stage) and the final ledger union — without
        # the cache each consumer refits the self-fit BigramLM's count
        # tables and re-runs the lang/quality gating from scratch.
        # Tiny table (doc_id + literal), same ledger/release lifecycle
        # as the dedup tiers.
        ppl_losers = _persisted(
            perplexity_score(base2, lm)
            .where(round4(F.col("ppl")) > cfg.max_perplexity)
            .select("doc_id", F.lit("perplexity").alias("reject_reason"))
        )
        s2 = s2.join(ppl_losers.select("doc_id"), "doc_id", "left_anti")
    else:
        ppl_losers = None

    # exact dedup: min-id-per-key, then join the docs back on the key
    # and reject everyone but the keeper. Two shuffles on the same
    # key, both with BOUNDED per-key state: min() partial-aggregates
    # map-side, and the join streams dup rows past a single keeper row
    # (AQE splits skewed keys). The earlier collect_list ledger
    # buffered every duplicate id of a key in one aggregation buffer —
    # at 100 TB a boilerplate page duplicated millions of times is
    # exactly the hottest key, i.e. a guaranteed skewed-key OOM. Same
    # (key -> min id) contract as operators.dedup.exact_dedup.
    # persisted: the keeper aggregate and the join probe below both
    # consume this projection; unpersisted, each re-filters the gate
    # cache and re-hashes the text (one extra md5 pass per branch)
    keyed = _persisted(s2.select("doc_id", F.md5("text").alias("__key")))
    keepers = keyed.groupBy("__key").agg(F.min("doc_id").alias("__keep"))
    exact_losers = (
        keyed.join(keepers, "__key")
        .where(F.col("doc_id") != F.col("__keep"))
        .select("doc_id", F.lit("exact_dup").alias("reject_reason"))
    )
    s3 = _persisted(
        s2.join(exact_losers.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "text")
    )

    # near-dup: pairs -> components -> min-id canonical survives. The
    # LSH tier's persisted shingle-set table doubles as the
    # decontamination stage's input below (filtered to survivors) —
    # one tokenize+shingle pass over the corpus instead of two, the
    # materialized-shingle-table shape a warehouse pipeline uses.
    from ..operators.dedup import shingle_sets

    quarantine = None
    if pairs_fn is None:
        sets3 = _persisted(shingle_sets(s3))
        pairs = minhash_lsh_dedup_pairs(
            s3, threshold=cfg.neardup_threshold,
            max_bucket=cfg.lsh_max_bucket, _sets=sets3,
        )
        if with_quarantine and cfg.lsh_max_bucket is not None:
            from ..operators.dedup import agg_signatures, lsh_hot_buckets

            quarantine = lsh_hot_buckets(
                agg_signatures(sets3), max_bucket=cfg.lsh_max_bucket
            )
    else:
        sets3 = None
        pairs = pairs_fn(s3)
    comp = connected_components(pairs)
    near_losers = comp.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id"), F.lit("near_dup").alias("reject_reason")
    )
    s4 = s3.join(near_losers.select("doc_id"), "doc_id", "left_anti")

    # semantic near-dup (optional): SemDeDup keep-set over the
    # SURVIVORS' embeddings — the semi-join scopes the clustering to
    # docs still in the funnel, and docs with no embedding row simply
    # never appear in the verdict (left-anti on losers admits them)
    if embeddings is not None:
        from ..operators.semdedup import semantic_dedup_keep

        emb4 = embeddings.select("doc_id", "embedding").join(
            s4.select("doc_id"), "doc_id", "left_semi"
        )
        verdict = semantic_dedup_keep(
            emb4, cfg.semantic_threshold, cfg.semantic_n_cells,
            cfg.semantic_dim, cfg.semantic_top_m, id_col="doc_id",
            vec_col="embedding", max_cell=cfg.semantic_max_cell,
        )
        sem_losers = verdict.where(~F.col("keep")).select(
            "doc_id", F.lit("semantic_dup").alias("reject_reason")
        )
        s4 = s4.join(sem_losers.select("doc_id"), "doc_id", "left_anti")
    else:
        sem_losers = None

    # decontamination: benchmark shingles broadcast, linear probe
    from ..queries.sampling import _BUCKET_SPARK

    if sets3 is not None:
        base_sets = sets3.join(s4.select("doc_id"), "doc_id", "left_semi")
    else:
        base_sets = shingle_sets(s4.select("doc_id", "text"))
    sets = base_sets.withColumn("bucket", F.expr(_BUCKET_SPARK))
    bench_sh = (
        sets.where(F.col("bucket") == cfg.bench_bucket)
        .select(F.explode("shs").alias("shingle"))
        .distinct()
    )
    corpus_sh = sets.where(F.col("bucket") != cfg.bench_bucket).select(
        "doc_id", "sz", F.explode("shs").alias("shingle")
    )
    # persisted: the contamination verdict feeds BOTH the s5 anti-join
    # (so block_bad's survivor scoping) and the final ledger union —
    # unpersisted, the shingle explode + broadcast probe + agg subtree
    # runs twice inside the one consuming action (measured 1.4 s per
    # extra run at sf0.1, r14 optimization round). Tiny table (doc_id +
    # literal), same ledger/release lifecycle as the dedup tiers.
    contam = _persisted(
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.first("sz").alias("__n"), F.count("*").alias("__c"))
        .where(F.col("__c") / F.col("__n") >= cfg.contamination_frac)
        .select("doc_id", F.lit("contaminated").alias("reject_reason"))
    )
    s5 = s4.join(contam.select("doc_id"), "doc_id", "left_anti")

    block_bad = (
        feats.join(s5.select("doc_id"), "doc_id", "left_semi")
        .where(F.col("__blocked"))
        .select("doc_id", F.lit("blocklist").alias("reject_reason"))
    )

    rejects = (
        lang_bad.unionByName(qual_bad)
        .unionByName(exact_losers)
        .unionByName(near_losers)
        .unionByName(contam)
        .unionByName(block_bad)
    )
    if sem_losers is not None:
        rejects = rejects.unionByName(sem_losers)
    if ppl_losers is not None:
        rejects = rejects.unionByName(ppl_losers)
    return (rejects, quarantine) if with_quarantine else rejects


def curate(spark: SparkSession, sf_dir: str, out_dir: str | None = None,
           cfg: CurationConfig = CurationConfig(),
           embeddings: DataFrame | None = None,
           langid_model_df: DataFrame | None = None
           ) -> tuple[DataFrame, DataFrame]:
    """Run the full curation funnel over the documents table. Returns
    (curated, stats): curated docs carry quality features and a
    deterministic md5-bucket train/val split; stats is the per-stage
    funnel ledger (kept + each reject_reason with counts). With
    ``out_dir`` the curated set is also written partitioned by split
    (the layout a downstream trainer shards by). ``embeddings``
    (doc_id, embedding) activates the optional semantic_dup gate;
    ``langid_model_df`` opts the lang gate into the trained
    multiclass lang-id — see curation_rejects."""
    docs = tables.load_table(spark, sf_dir, "documents")
    rejects = curation_rejects(docs, cfg, embeddings=embeddings,
                               langid_model_df=langid_model_df)

    marked = docs.join(rejects, "doc_id", "left")
    stats = (
        marked.groupBy(
            F.coalesce(F.col("reject_reason"), F.lit("kept")).alias("stage")
        )
        .agg(F.count("*").alias("n_docs"))
    )

    toks = tokens("text")
    bucket = F.abs(F.xxhash64(F.col("doc_id"), F.lit("split"))) % cfg.n_splits
    curated = (
        marked.where(F.col("reject_reason").isNull())
        .select(
            "doc_id",
            "text",
            "lang",
            _quality(F.col("text"), toks).alias("quality"),
            F.md5(
                F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
            ).alias("fingerprint"),
            F.when(bucket.isin(*cfg.holdout_splits), "val")
            .otherwise("train")
            .alias("split"),
        )
    )
    if out_dir is not None:
        curated.write.partitionBy("split").mode("overwrite").parquet(out_dir)
    return curated, stats
