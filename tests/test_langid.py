"""Trained multiclass lang-id tier (operators/classifier.py:
softmax_fit / langid_score — the CCNet deployment shape: a
fastText-style linear lang-id over the hashed unigram+bigram feature
map, replacing the stopword-argmax heuristic when a trained model is
available). Full-batch GD is deterministic given the features, so
the distributed fit must land on the numpy reference to float
accumulation error — the logreg pin's contract, one softmax up."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.classifier import (
    hashed_doc_features,
    langid_score,
    softmax_fit,
)

BUCKETS = 128
ITERS = 10
LR = 1.0
L2 = 1e-4
VOCAB = {
    "aa": ["the", "and", "with", "house", "water"],
    "bb": ["der", "und", "mit", "haus", "wasser"],
    "cc": ["le", "et", "avec", "maison", "eau"],
}


def _corpus():
    rng = random.Random(5)
    rows = []
    langs = sorted(VOCAB)
    for i in range(90):
        lang = langs[i % 3]
        rows.append((i, " ".join(rng.choice(VOCAB[lang])
                                 for _ in range(12)), lang))
    rows.append((900, "", langs[0]))  # token-free doc
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        _corpus(), "doc_id long, text string, lang string"
    )


@pytest.fixture(scope="module")
def model(docs):
    return softmax_fit(docs, "lang", buckets=BUCKETS, iters=ITERS,
                       lr=LR, l2=L2)


def _reference_fit(spark_feats, rows):
    ids = sorted(i for i, _t, _l in rows)
    idx = {d: j for j, d in enumerate(ids)}
    classes = sorted({l for _i, _t, l in rows})
    X = np.zeros((len(ids), BUCKETS))
    for r in spark_feats:
        X[idx[r.doc_id], r.b] = 1.0 + math.log(r.cnt)
    Y = np.zeros((len(ids), len(classes)))
    for i, _t, l in rows:
        Y[idx[i], classes.index(l)] = 1.0
    W = np.zeros((len(classes), BUCKETS))
    b = np.zeros(len(classes))
    n = len(ids)
    for _ in range(ITERS):
        M = X @ W.T + b
        M -= M.max(axis=1, keepdims=True)
        E = np.exp(M)
        P = E / E.sum(axis=1, keepdims=True)
        R = P - Y
        W -= LR * ((R.T @ X) / n + L2 * W)
        b -= LR * (R.sum(axis=0) / n)
    return classes, W, b


def test_softmax_fit_matches_numpy_reference(docs, model):
    feats = hashed_doc_features(docs, BUCKETS).collect()
    classes, W_ref, b_ref = _reference_fit(feats, _corpus())
    assert list(model.classes) == classes
    assert float(np.abs(model.weights - W_ref).max()) < 1e-10
    assert float(np.abs(model.biases - b_ref).max()) < 1e-10


def test_langid_separates_planted_languages(spark, docs, model):
    got = {r.doc_id: (r.lang, r.prob)
           for r in langid_score(docs, model.as_df(spark)).collect()}
    truth = {i: l for i, _t, l in _corpus()}
    hits = sum(1 for i, l in truth.items()
               if i != 900 and got[i][0] == l)
    assert hits == len(truth) - 1  # every real doc correctly id'd
    for i in truth:
        if i != 900:
            assert got[i][1] > 1.0 / 3.0  # winner beats uniform


def test_token_free_doc_scores_on_biases(spark, docs, model):
    got = {r.doc_id: (r.lang, r.prob)
           for r in langid_score(docs, model.as_df(spark)).collect()}
    b = model.biases - model.biases.max()
    e = np.exp(b)
    want_cls = model.classes[int(
        min(range(len(b)), key=lambda i: (-b[i], model.classes[i]))
    )]
    assert got[900][0] == want_cls
    assert got[900][1] == pytest.approx(float(e.max() / e.sum()),
                                        rel=1e-12)


def test_persisted_model_scores_identically(spark, docs, model,
                                            tmp_path):
    path = str(tmp_path / "langid")
    model.as_df(spark).coalesce(1).write.parquet(path)
    fresh = {(r.doc_id, r.lang, r.prob)
             for r in langid_score(docs, model.as_df(spark)).collect()}
    loaded = {(r.doc_id, r.lang, r.prob)
              for r in langid_score(
                  docs, spark.read.parquet(path)).collect()}
    assert fresh == loaded


def test_langid_validation_errors(spark, docs, model):
    mdf = model.as_df(spark)
    with pytest.raises(ValueError, match="trained with hasher"):
        langid_score(docs, mdf, hasher="md5").collect()
    with pytest.raises(ValueError, match="unknown damping"):
        langid_score(docs, mdf, damping="sqrt")
    with pytest.raises(ValueError, match="bucket-count sentinel"):
        langid_score(docs, mdf.where("cls <> ''"))
    with pytest.raises(ValueError, match="not dense"):
        langid_score(docs, mdf.where("cls = '' OR b < 0 OR w <> 0.0"))


def test_null_labels_excluded_from_fit(spark, docs, model):
    """Docs with a NULL label must not dilute the learning rate: their
    residuals are NULL (y == class is NULL) so they never drive the
    gradient, and counting them in n silently shrank every step (r13
    ADVICE). A fit over the corpus plus null-labeled extras must land
    on the same weights as the fit without them."""
    extra = spark.createDataFrame(
        [(1000 + i, "noise words here", None) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    diluted = softmax_fit(docs.unionByName(extra), "lang",
                          buckets=BUCKETS, iters=ITERS, lr=LR, l2=L2)
    assert list(diluted.classes) == list(model.classes)
    assert float(np.abs(diluted.weights - model.weights).max()) < 1e-9
    assert float(np.abs(diluted.biases - model.biases).max()) < 1e-9


def test_fit_rejects_all_null_labels(spark):
    bad = spark.createDataFrame(
        [(1, "a b c", None)], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="no non-null labels"):
        softmax_fit(bad, "lang", buckets=16, iters=1)


def test_intercept_only_class_trips_dense_validation(spark, docs,
                                                     model):
    """A corrupt table where a class keeps ONLY its b=-1 intercept row
    must raise the dense-block error, not be silently dropped from
    scoring (r13 ADVICE — the mirror of weights-without-intercept)."""
    mdf = model.as_df(spark)
    corrupt = mdf.where("cls = '' OR cls <> 'aa' OR b = -1")
    with pytest.raises(ValueError, match="not dense"):
        langid_score(docs, corrupt)


def test_fit_rejects_empty_class_label(spark):
    bad = spark.createDataFrame(
        [(1, "a b c", ""), (2, "d e f", "x")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="sentinel"):
        softmax_fit(bad, "lang", buckets=16, iters=1)


def test_inrow_langid_matches_batch_scorer(spark):
    """langid_expr (pure row expression, the streaming gate form)
    must agree with langid_score's argmax exactly for a
    damping='none' model — the classifier_margin_expr contract, one
    softmax up — and raise for log-damped models."""
    import random

    rng = random.Random(9)
    rows = [(i, " ".join(rng.choice(VOCAB[sorted(VOCAB)[i % 3]])
                         for _ in range(10)), sorted(VOCAB)[i % 3])
            for i in range(60)] + [(900, "", "aa")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    from web3_flight_rpc_server_spark.operators.classifier import (
        langid_expr,
    )

    m_none = softmax_fit(docs, "lang", buckets=BUCKETS, iters=6,
                         lr=1.0, damping="none")
    batch = {r.doc_id: r.lang
             for r in langid_score(docs, m_none.as_df(spark),
                                   damping="none").collect()}
    inrow = {r.doc_id: r.l for r in docs.select(
        "doc_id", langid_expr(m_none, "text").alias("l")
    ).collect()}
    assert inrow == batch

    m_log = softmax_fit(docs, "lang", buckets=BUCKETS, iters=2)
    with pytest.raises(ValueError, match="damping='none'"):
        langid_expr(m_log, "text")


def test_gate_stream_trained_langid(spark, tmp_path):
    """gate_stream(langid_model=...): the trained lang-id gates a
    real stream — modeled-language docs admitted, the other language
    rejected, where the stopword heuristic would call everything
    'unknown' and admit nothing."""
    import os

    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
    )
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        gate_stream,
    )

    seed = spark.createDataFrame(
        [(i, " ".join(VOCAB[sorted(VOCAB)[i % 3]]), sorted(VOCAB)[i % 3])
         for i in range(30)],
        "doc_id long, text string, lang string",
    )
    model = softmax_fit(seed, "lang", buckets=BUCKETS, iters=6,
                        lr=1.0, damping="none")
    cfg = CurationConfig(allowed_langs=("aa",), min_quality=0.0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, " ".join(VOCAB["aa"] * 2), "x"),
         (2, " ".join(VOCAB["bb"] * 2), "x")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.parquet(src + "/b0")
    out = []
    q = (
        gate_stream(
            spark.readStream.schema("doc_id long, text string, lang string")
            .parquet(src + "/*"),
            cfg, langid_model=model,
        )
        .writeStream.foreachBatch(
            lambda df, bid: out.extend(r.doc_id for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert out == [1]


def test_gated_ingest_exactly_once_trained_langid(spark, tmp_path):
    """gated_ingest_exactly_once(langid_model=...): the trained
    lang-id gate works on the exactly-once sink path too (r13 ADVICE —
    the parameter used to stop at plain gate_stream)."""
    import os

    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
    )
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        gated_ingest_exactly_once,
    )
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        read_committed,
    )

    seed = spark.createDataFrame(
        [(i, " ".join(VOCAB[sorted(VOCAB)[i % 3]]), sorted(VOCAB)[i % 3])
         for i in range(30)],
        "doc_id long, text string, lang string",
    )
    model = softmax_fit(seed, "lang", buckets=BUCKETS, iters=6,
                        lr=1.0, damping="none")
    cfg = CurationConfig(allowed_langs=("aa",), min_quality=0.0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, " ".join(VOCAB["aa"] * 2), "x"),
         (2, " ".join(VOCAB["bb"] * 2), "x")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.parquet(src + "/b0")
    q = gated_ingest_exactly_once(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src + "/*"),
        str(tmp_path / "gated"), str(tmp_path / "ck"),
        cfg=cfg, langid_model=model,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r.doc_id for r in read_committed(
        spark, str(tmp_path / "gated")).collect()]
    assert got == [1]


def test_local_fit_tier_matches_distributed_bitwise(spark, docs,
                                                    monkeypatch):
    """The plan-size-gated driver-local iteration tier must be
    invisible in the weights: same blocks, same zero accumulators,
    same partition-order fold as treeAggregate(depth=1) — EXACT
    equality, not tolerance (r14 optimization round)."""
    from web3_flight_rpc_server_spark.operators import classifier as C

    m_local = softmax_fit(docs, "lang", buckets=BUCKETS, iters=4,
                          lr=LR, l2=L2)
    monkeypatch.setattr(C, "_LOCAL_FIT_MAX_BYTES", -1)
    m_dist = softmax_fit(docs, "lang", buckets=BUCKETS, iters=4,
                         lr=LR, l2=L2)
    assert list(m_local.classes) == list(m_dist.classes)
    assert np.array_equal(m_local.weights, m_dist.weights)
    assert np.array_equal(m_local.biases, m_dist.biases)


def test_shared_feats_fit_and_score_match_unshared(spark, docs):
    """softmax_fit/langid_score given a shared damped_features table
    (q_langid's one-md5-pass shape) must produce byte-identical
    weights and scores to the build-it-themselves path."""
    from web3_flight_rpc_server_spark.operators.classifier import (
        damped_features,
    )

    base = docs.select("doc_id", "text").repartition(8, "doc_id")
    feats = damped_features(base, BUCKETS).persist()
    try:
        m_shared = softmax_fit(docs, "lang", buckets=BUCKETS, iters=4,
                               lr=LR, l2=L2, _feats=feats)
        m_plain = softmax_fit(docs, "lang", buckets=BUCKETS, iters=4,
                              lr=LR, l2=L2)
        assert np.array_equal(m_shared.weights, m_plain.weights)
        assert np.array_equal(m_shared.biases, m_plain.biases)
        mdf = m_plain.as_df(spark)
        got_shared = {
            (r.doc_id, r.lang, round(r.prob, 12))
            for r in langid_score(docs, mdf, _feats=feats).collect()
        }
        got_plain = {
            (r.doc_id, r.lang, round(r.prob, 12))
            for r in langid_score(docs, mdf).collect()
        }
        assert got_shared == got_plain
    finally:
        feats.unpersist()
