"""LM-based curation queries (operators/lm.py): bigram-perplexity
quality scoring and DSIR importance resampling, each with a full
value-hash DuckDB oracle recomputing the model from raw text."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..registry import query
from ..sources import tables

# Shared oracle fragment: the cleaned token array per document —
# string_split on space, lowercased, empties dropped (the q_vocab
# tokenization contract all LM tiers share).
_ARRS = """
    arrs AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           x -> x <> '') AS arr
        FROM documents
    )"""


@query(
    "q_perplexity",
    declared=False,
    oracle=f"""
    WITH{_ARRS},
    pairs AS (
        SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
        FROM arrs, unnest(generate_series(1, len(arr) - 1)) AS t(i)
    ),
    big AS (
        SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n2
        FROM pairs GROUP BY w1, w2
    ),
    ctx AS (SELECT w1, sum(n2) AS n1 FROM big GROUP BY w1),
    vs AS (
        SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
        FROM (SELECT unnest(arr) AS tok FROM arrs)
    ),
    lps AS (
        SELECT p.doc_id,
               ln((coalesce(b.n2, 0) + 0.5)
                  / (coalesce(c.n1, 0) + 0.5 * (SELECT v FROM vs))) AS lp
        FROM pairs p
        LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
        LEFT JOIN ctx c ON p.w1 = c.w1
    )
    SELECT d.doc_id,
           CAST(count(l.lp) AS BIGINT) AS n_bigrams,
           floor(exp(-avg(l.lp)) * 10000 + 0.5) / 10000 AS ppl
    FROM documents d LEFT JOIN lps l ON d.doc_id = l.doc_id
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter, trained tier (operators/lm.py):
    fit an add-0.5 bigram model on the corpus, score every document's
    perplexity under it. The oracle refits the identical model from
    raw text — counts, smoothing, log-mean and exp all recomputed in
    DuckDB, hash-parity per document. Extends C13 past the
    model-free unigram tier (vocab.unigram_logprob_score)."""
    from ..operators.lm import bigram_lm_fit, perplexity_score

    docs = tables.load_table(spark, sf_dir, "documents")
    lm = bigram_lm_fit(docs, add_k=0.5)
    return (
        perplexity_score(docs, lm)
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            round4(F.col("ppl")).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_dsir",
    declared=False,
    oracle=f"""
    WITH{_ARRS},
    feats AS (
        SELECT doc_id, f FROM (
            SELECT doc_id, unnest(arr) AS f FROM arrs
            UNION ALL
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS f
            FROM arrs, unnest(generate_series(1, len(arr) - 1)) AS t(i)
        )
    ),
    fb AS (
        SELECT doc_id,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % 512 AS b
        FROM feats
    ),
    raw AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM fb GROUP BY b),
    tgt AS (
        SELECT fb.b, CAST(count(*) AS DOUBLE) AS ct
        FROM fb JOIN documents d USING (doc_id)
        WHERE d.lang = 'en' GROUP BY fb.b
    ),
    tot AS (
        SELECT (SELECT sum(cr) FROM raw) AS tr,
               (SELECT sum(ct) FROM tgt) AS tt
    ),
    lam AS (
        SELECT gs.b,
               ln((coalesce(t.ct, 0) + 1.0) / (tot.tt + 512.0))
               - ln((coalesce(r.cr, 0) + 1.0) / (tot.tr + 512.0)) AS lam
        FROM (SELECT unnest(generate_series(0, 511)) AS b) gs
        LEFT JOIN tgt t ON gs.b = t.b
        LEFT JOIN raw r ON gs.b = r.b
        CROSS JOIN tot
    ),
    w AS (
        SELECT fb.doc_id, sum(lam.lam) AS log_w
        FROM fb JOIN lam ON fb.b = lam.b GROUP BY fb.doc_id
    ),
    g AS (
        SELECT doc_id, log_w,
               log_w - ln(-ln(
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                       || ':dsir:7'), 1, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0)) AS gk
        FROM w
    ),
    sel AS (
        SELECT doc_id, log_w FROM g
        ORDER BY gk DESC, doc_id ASC LIMIT 50
    )
    SELECT doc_id, floor(log_w * 10000 + 0.5) / 10000 AS log_w4
    FROM sel ORDER BY doc_id
    """,
)
def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/lm.py; Xie et al. 2023):
    select 50 documents from the full pool to match the lang='en'
    target distribution — hashed unigram+bigram multinomials over 512
    buckets, add-1 smoothing, per-doc log importance weights, and a
    deterministic Gumbel-top-k draw via the md5-bridge uniform. The
    oracle replays every stage (feature hash, both multinomials, the
    log-ratio table, weights, Gumbel keys, the top-50 cut) from raw
    text; the returned weights hash-match per selected document.
    Extends C19's mixture/split tier with distribution-matching
    selection."""
    from ..operators.lm import dsir_log_weights, dsir_resample

    docs = tables.load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    # target_within: the en-slice IS a subset of the pool, so its
    # multinomial folds the persisted candidate feature table (the
    # oracle's own tgt CTE shape) instead of re-hashing 41% of the
    # corpus through a second md5 feature pass (r14 session 3)
    w = dsir_log_weights(docs, target, buckets=512, smoothing=1.0,
                         hasher="md5", target_within=True)
    sel = dsir_resample(w, k=50, seed=7)
    return sel.select(
        "doc_id", round4(F.col("log_w")).alias("log_w4")
    ).orderBy("doc_id")


# the at-rest artifact q_quality_score trains/writes and its DuckDB
# oracle reads back — per-process path, same rationale as
# queries/vectors.py:_TRAINED_CELLS_PATH (the driver runs the Spark
# query and its oracle in one process; concurrent sessions get
# disjoint directories).
import os as _os
import tempfile as _tempfile

_CLF_PATH = _os.path.join(
    _tempfile.gettempdir(), f"w3frs_quality_clf_{_os.getpid()}"
)


@query(
    "q_quality_score",
    declared=False,
    oracle=f"""
    WITH{_ARRS},
    feats AS (
        SELECT doc_id, f FROM (
            SELECT doc_id, unnest(arr) AS f FROM arrs
            UNION ALL
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS f
            FROM arrs, unnest(generate_series(1, len(arr) - 1)) AS t(i)
        )
    ),
    cnts AS (
        SELECT doc_id,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % 512 AS b,
               CAST(count(*) AS DOUBLE) AS cnt
        FROM feats GROUP BY doc_id, b
    ),
    wt AS (
        SELECT b, w FROM read_parquet('{_CLF_PATH}/*.parquet')
        WHERE b >= 0
    ),
    bias AS (
        SELECT w AS bw FROM read_parquet('{_CLF_PATH}/*.parquet')
        WHERE b = -1
    ),
    m AS (
        SELECT c.doc_id, sum(wt.w * (1 + ln(c.cnt))) AS m
        FROM cnts c JOIN wt ON c.b = wt.b GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           floor((1.0 / (1.0 + exp(-(coalesce(m.m, 0)
                  + (SELECT bw FROM bias))))) * 10000 + 0.5) / 10000
               AS score
    FROM documents d LEFT JOIN m USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (operators/classifier.py): logistic
    regression over the DSIR feature map, fit distributively on the
    corpus with lang='en' as the seed label (the DCLM/FineWeb-Edu
    shape: small labeled seed -> linear scorer -> score the pool),
    weights persisted at rest, every document scored by one broadcast
    join. The oracle recomputes each score from raw text plus the
    persisted weight table alone — feature hash, tf damping, margin
    and sigmoid all replayed in DuckDB. Training itself is an
    iterative fixpoint SQL cannot express; it is numpy-reference-
    pinned (machine epsilon) in tests/test_classifier.py."""
    from ..operators.classifier import classifier_score, logreg_fit

    docs = tables.load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "__y", (F.col("lang") == "en").cast("int")
    )
    model = logreg_fit(
        labeled, "__y", buckets=512, iters=12, lr=1.0, hasher="md5"
    )
    model.as_df(spark).coalesce(1).write.mode("overwrite").parquet(_CLF_PATH)
    weights = spark.read.parquet(_CLF_PATH)
    return classifier_score(docs, weights, hasher="md5").select(
        "doc_id", round4(F.col("score")).alias("score")
    ).orderBy("doc_id")


# the at-rest artifact q_langid trains/writes — per-process path,
# same rationale as _CLF_PATH above
_LANGID_PATH = _os.path.join(
    _tempfile.gettempdir(), f"w3frs_langid_{_os.getpid()}"
)


@query(
    "q_langid",
    oracle=f"""
    WITH{_ARRS},
    feats AS (
        SELECT doc_id, f FROM (
            SELECT doc_id, unnest(arr) AS f FROM arrs
            UNION ALL
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS f
            FROM arrs, unnest(generate_series(1, len(arr) - 1)) AS t(i)
        )
    ),
    cnts AS (
        SELECT doc_id,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b,
               CAST(count(*) AS DOUBLE) AS cnt
        FROM feats GROUP BY doc_id, b
    ),
    wt AS (
        SELECT cls, b, w FROM read_parquet('{_LANGID_PATH}/*.parquet')
        WHERE cls <> '' AND b >= 0
    ),
    bias AS (
        SELECT cls, w AS bw FROM read_parquet('{_LANGID_PATH}/*.parquet')
        WHERE cls <> '' AND b = -1
    ),
    m AS (
        SELECT c.doc_id, w.cls, sum(w.w * (1 + ln(c.cnt))) AS m
        FROM cnts c JOIN wt w USING (b) GROUP BY c.doc_id, w.cls
    ),
    allm AS (
        SELECT d.doc_id, bias.cls, coalesce(m.m, 0) + bias.bw AS m
        FROM documents d CROSS JOIN bias
        LEFT JOIN m ON m.doc_id = d.doc_id AND m.cls = bias.cls
    ),
    sm AS (
        SELECT doc_id, cls, m,
               max(m) OVER (PARTITION BY doc_id) AS mx
        FROM allm
    ),
    sm2 AS (
        SELECT doc_id, cls, exp(m - mx) AS e,
               sum(exp(m - mx)) OVER (PARTITION BY doc_id) AS denom,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY m DESC, cls ASC) AS rn
        FROM sm
    )
    SELECT doc_id, cls AS lang,
           floor(e / denom * 10000 + 0.5) / 10000 AS prob4
    FROM sm2 WHERE rn = 1 ORDER BY doc_id
    """,
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multiclass language ID (operators/classifier.py:
    softmax_fit / langid_score — the CCNet deployment shape): a
    fastText-style softmax over the DSIR feature map, fit
    distributively on the corpus with the fixture ``lang`` as the
    seed label, weights persisted at rest, every document's argmax
    language + softmax probability recomputed by the oracle from raw
    text plus the persisted (cls, b, w) table alone — feature hash,
    tf damping, per-class margins, max-shifted softmax and the
    margin-desc/class-asc argmax tie-break all replayed in DuckDB
    (the q_quality_score at-rest pattern, one softmax up). Training
    is an iterative fixpoint SQL cannot express; it is
    numpy-reference-pinned in tests/test_langid.py. Declared in r14
    (took q_retention's slot — r13 VERDICT #2: the strongest
    undeclared row, parity green at both SFs in r13)."""
    from ..operators.classifier import (
        _plan_size,
        damped_features,
        langid_score,
        softmax_fit,
    )
    from ..operators.dedup import _persisted

    docs = tables.load_table(spark, sf_dir, "documents")
    # ONE md5 feature pass for fit AND score (r14 optimization round):
    # the damped (id, b, x) design table is a deterministic function
    # of the corpus alone, and the oracle-bridge md5 hash is the
    # expensive half of either pass — persist it once and share it.
    # Cache lifecycle: the fit materializes it inside the timed
    # region; bench releases it after the scoring action
    # (release_caches), so every timed run recomputes from parquet.
    # The partition count is EXPLICIT and scale-adaptive (plan-time
    # estimate, ~32 KB of compressed text per partition, clamped to
    # [8, defaultParallelism]): a cached plan pins its partitioning
    # (AQE cannot coalesce it), so an unpinned repartition under a
    # plain 200-shuffle-partition session would freeze 200 micro-
    # partitions into the cache and every downstream stage.
    sc = spark.sparkContext
    est = _plan_size(docs.select("doc_id", "text")) or 0
    parts = max(8, min(sc.defaultParallelism, est // (32 << 10) + 1))
    base = docs.select("doc_id", "text").repartition(parts, "doc_id")
    feats = _persisted(
        damped_features(base, 256, hasher="md5", damping="log")
    )
    model = softmax_fit(docs, "lang", buckets=256, iters=8, lr=1.0,
                        hasher="md5", _feats=feats)
    model.as_df(spark).coalesce(1).write.mode("overwrite").parquet(
        _LANGID_PATH
    )
    weights = spark.read.parquet(_LANGID_PATH)
    return langid_score(docs, weights, hasher="md5",
                        _feats=feats).select(
        "doc_id", "lang", round4(F.col("prob")).alias("prob4")
    ).orderBy("doc_id")
