"""Hashed-feature logistic-regression quality classifier
(operators/classifier.py) vs a numpy reference on the identical
feature matrix — full-batch GD is deterministic given the features,
so the distributed fit must land on the reference weights to float
accumulation error (machine-epsilon scale), not just 'close'."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.classifier import (
    classifier_score,
    hashed_doc_features,
    logreg_fit,
)

BUCKETS = 256
ITERS = 12
LR = 1.0
L2 = 1e-4


def _corpus():
    rng = random.Random(3)
    good = ["alpha", "beta", "gamma", "good", "fine"]
    bad = ["zeta", "noise", "junk", "bad", "ugly"]
    rows = []
    for i in range(120):
        pool = good if i % 2 == 0 else bad
        rows.append((i, " ".join(rng.choice(pool) for _ in range(15)),
                     1 if i % 2 == 0 else 0))
    rows.append((900, "", 0))  # token-free doc: anchors the bias only
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, text string, label int")


@pytest.fixture(scope="module")
def model(docs):
    return logreg_fit(docs, "label", buckets=BUCKETS, iters=ITERS,
                      lr=LR, l2=L2)


def _reference_fit(spark_feats, rows):
    ids = sorted(i for i, _t, _y in rows)
    idx = {d: j for j, d in enumerate(ids)}
    X = np.zeros((len(ids), BUCKETS))
    for r in spark_feats:
        X[idx[r.doc_id], r.b] = 1.0 + math.log(r.cnt)
    y = np.array([y for _i, _t, y in sorted(rows)], dtype=float)
    w = np.zeros(BUCKETS)
    b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r_ = p - y
        w -= LR * ((X.T @ r_) / len(ids) + L2 * w)
        b -= LR * r_.mean()
    return X, w, b


def test_fit_matches_numpy_reference(docs, model):
    feats = hashed_doc_features(docs, BUCKETS).collect()
    _X, w_ref, b_ref = _reference_fit(feats, _corpus())
    assert float(np.abs(model.weights - w_ref).max()) < 1e-12
    assert abs(model.bias - b_ref) < 1e-12


def test_classifier_separates_planted_classes(spark, docs, model):
    scored = classifier_score(docs, model.as_df(spark))
    got = {r.doc_id: r.score
           for r in scored.join(docs.select("doc_id"), "doc_id").collect()}
    labels = {i: y for i, _t, y in _corpus()}
    acc = sum(
        1 for i, y in labels.items() if i != 900 and (got[i] > 0.5) == (y == 1)
    ) / (len(labels) - 1)
    assert acc == 1.0


def test_token_free_doc_scores_at_bias(spark, docs, model):
    scored = classifier_score(docs, model.as_df(spark))
    got = {r.doc_id: r.score for r in scored.collect()}
    assert got[900] == pytest.approx(
        1.0 / (1.0 + math.exp(-model.bias)), rel=1e-12
    )


def test_persisted_model_scores_identically(spark, docs, model, tmp_path):
    path = str(tmp_path / "clf")
    model.as_df(spark).coalesce(1).write.parquet(path)
    fresh = {r.doc_id: r.score
             for r in classifier_score(docs, model.as_df(spark)).collect()}
    loaded = {r.doc_id: r.score
              for r in classifier_score(
                  docs, spark.read.parquet(path)).collect()}
    assert fresh == loaded


def test_fit_rejects_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        logreg_fit(empty, "label", buckets=16, iters=1)


def test_model_records_training_config(model):
    # r12: the model carries how it was fit so scorers can validate
    assert model.damping == "log"
    assert model.hasher == "xxhash64"


def test_score_rejects_hasher_mismatch(spark, docs, model):
    with pytest.raises(ValueError, match="trained with hasher"):
        classifier_score(docs, model.as_df(spark), hasher="md5").collect()


def test_score_rejects_damping_mismatch(spark, docs, model):
    with pytest.raises(ValueError, match="trained with damping"):
        classifier_score(
            docs, model.as_df(spark), damping="none"
        ).collect()


def test_score_rejects_unknown_args_descriptively(spark, docs, model):
    # r12 ADVICE: an unknown damping/hasher on a sentinel-bearing
    # model must raise the descriptive ValueError, not a KeyError
    # out of the sentinel-code lookup
    mdf = model.as_df(spark)
    with pytest.raises(ValueError, match="unknown damping"):
        classifier_score(docs, mdf, damping="sqrt").collect()
    with pytest.raises(ValueError, match="unknown hasher"):
        classifier_score(docs, mdf, hasher="sha1").collect()


def test_score_rejects_empty_weight_table(spark, docs):
    # r12 ADVICE: no b >= 0 rows and no -2 sentinel used to hit
    # int(None) on the max(b) + 1 fallback
    empty = spark.createDataFrame([(-1, 0.5)], "b long, w double")
    with pytest.raises(ValueError, match="empty weight table"):
        classifier_score(docs, empty).collect()


def test_score_rejects_pruned_weight_table(spark, docs, model):
    # a nonzero-only "compacted" table would shift the hash modulus
    # under the old count(b >= 0) inference — now it raises
    pruned = model.as_df(spark).where("b < 0 OR w <> 0.0")
    with pytest.raises(ValueError, match="not dense"):
        classifier_score(docs, pruned).collect()


def test_score_accepts_legacy_table_without_sentinels(spark, docs, model):
    # pre-r12 persisted tables have only b >= -1 rows: modulus falls
    # back to max(b) + 1 (dense-checked) and config checks are skipped
    legacy = model.as_df(spark).where("b >= -1")
    fresh = {r.doc_id: r.score
             for r in classifier_score(docs, model.as_df(spark)).collect()}
    old = {r.doc_id: r.score
           for r in classifier_score(docs, legacy).collect()}
    assert fresh == old


def test_margin_expr_rejects_log_damped_model(model):
    from web3_flight_rpc_server_spark.operators.classifier import (
        classifier_margin_expr,
    )

    with pytest.raises(ValueError, match="damping='none'"):
        classifier_margin_expr(model, "text")


def test_margin_expr_rejects_hasher_mismatch(spark, docs):
    from web3_flight_rpc_server_spark.operators.classifier import (
        classifier_margin_expr,
    )

    m = logreg_fit(docs.withColumn("label", (F.col("doc_id") % 2).cast("int")),
                   "label", buckets=32, iters=1, damping="none")
    with pytest.raises(ValueError, match="trained with hasher"):
        classifier_margin_expr(m, "text", hasher="md5")


def test_local_fit_tier_matches_distributed_bitwise(spark, docs,
                                                    monkeypatch):
    """logreg twin of the langid tier-equality pin: the driver-local
    iteration tier (plan-size gate) must yield EXACTLY the
    distributed tier's weights (r14 optimization round)."""
    from web3_flight_rpc_server_spark.operators import classifier as C

    m_local = logreg_fit(docs, "label", buckets=BUCKETS, iters=4,
                         lr=LR, l2=L2)
    monkeypatch.setattr(C, "_LOCAL_FIT_MAX_BYTES", -1)
    m_dist = logreg_fit(docs, "label", buckets=BUCKETS, iters=4,
                        lr=LR, l2=L2)
    assert np.array_equal(m_local.weights, m_dist.weights)
    assert m_local.bias == m_dist.bias
