"""Bigram LM perplexity + DSIR importance resampling
(operators/lm.py) against pure-Python references — the same
golden-equality spirit as tests/test_bpe.py: every number the Spark
plan emits is recomputed driver-side from first principles."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from web3_flight_rpc_server_spark.operators.lm import (
    BigramLM,
    bigram_lm_fit,
    dsir_log_weights,
    dsir_resample,
    gumbel_key,
    hashed_features,
    perplexity_score,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "a  dog"),            # double space -> empty token dropped
    (4, "single"),            # < 2 tokens: no bigrams
    (5, "the cat sat on the mat"),   # exact repeat skews the counts
    (6, ""),                  # token-free
]


def _toks(t: str) -> list[str]:
    return [w for w in t.lower().split(" ") if w]


def _ref_model(corpus, add_k=0.5):
    bi, ctx, vocab = Counter(), Counter(), set()
    for _i, t in corpus:
        ws = _toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    return bi, ctx, len(vocab), add_k


def _ref_ppl(text, bi, ctx, v, k):
    ws = _toks(text)
    prs = list(zip(ws, ws[1:]))
    if not prs:
        return 0, None
    lps = [math.log((bi[(a, b)] + k) / (ctx[a] + k * v)) for a, b in prs]
    return len(prs), math.exp(-sum(lps) / len(lps))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def lm(docs):
    return bigram_lm_fit(docs, add_k=0.5)


def test_fit_counts_match_reference(lm):
    bi, ctx, v, _k = _ref_model(CORPUS)
    got_bi = {(r.w1, r.w2): r.n2 for r in lm.bigrams.collect()}
    assert got_bi == {kk: float(n) for kk, n in bi.items()}
    got_ctx = {r.w1: r.n1 for r in lm.contexts.collect()}
    assert got_ctx == {w: float(n) for w, n in ctx.items()}
    assert lm.vsize.collect()[0].v == float(v)


def test_contexts_are_bigram_marginals(lm):
    # c(w1) == sum_w2 c(w1, w2) by construction — the model is
    # self-consistent no matter what the corpus looks like
    from pyspark.sql import functions as F

    marg = lm.bigrams.groupBy("w1").agg(F.sum("n2").alias("m"))
    diff = (
        lm.contexts.join(marg, "w1", "full")
        .where("n1 IS DISTINCT FROM m")
        .count()
    )
    assert diff == 0


def test_perplexity_matches_reference_exactly(docs, lm):
    bi, ctx, v, k = _ref_model(CORPUS)
    got = {r.doc_id: (r.n_bigrams, r.ppl)
           for r in perplexity_score(docs, lm).collect()}
    for doc_id, text in CORPUS:
        n_ref, ppl_ref = _ref_ppl(text, bi, ctx, v, k)
        n_got, ppl_got = got[doc_id]
        assert n_got == n_ref, doc_id
        if ppl_ref is None:
            assert ppl_got is None, doc_id
        else:
            assert ppl_got == pytest.approx(ppl_ref, rel=1e-12), doc_id


def test_unseen_bigrams_cost_more_than_seen(spark, lm):
    # a doc of in-vocab tokens in never-seen order scores strictly
    # worse than the corpus's own most frequent sentence
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    ppl = {r.doc_id: r.ppl for r in perplexity_score(probe, lm).collect()}
    assert ppl[101] > ppl[100]


def test_fit_rejects_nonpositive_k(docs):
    with pytest.raises(ValueError, match="add_k"):
        bigram_lm_fit(docs, add_k=0.0)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

DSIR_CORPUS = [
    (1, "alpha beta alpha beta alpha"),
    (2, "alpha beta gamma"),
    (3, "delta epsilon zeta"),
    (4, "delta epsilon delta epsilon"),
    (5, "alpha delta"),
    (6, "beta beta beta"),
]
TARGET_IDS = {1, 2, 6}  # the alpha/beta-flavored half
BUCKETS = 64
SMOOTH = 1.0
SEED = 7


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str) -> list[int]:
    ws = _toks(text)
    fs = list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [_md5_60(f) % BUCKETS for f in fs]


def _ref_logw(corpus, target_ids):
    raw, tgt = Counter(), Counter()
    for i, t in corpus:
        for b in _feats(t):
            raw[b] += 1
            if i in target_ids:
                tgt[b] += 1
    tr, tt = sum(raw.values()), sum(tgt.values())
    lam = {
        b: math.log((tgt[b] + SMOOTH) / (tt + SMOOTH * BUCKETS))
        - math.log((raw[b] + SMOOTH) / (tr + SMOOTH * BUCKETS))
        for b in range(BUCKETS)
    }
    out = {}
    for i, t in corpus:
        fs = _feats(t)
        if fs:
            out[i] = sum(lam[b] for b in fs)
    return out


@pytest.fixture(scope="module")
def dsir_docs(spark):
    return spark.createDataFrame(DSIR_CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights(dsir_docs):
    target = dsir_docs.where(f"doc_id IN {tuple(TARGET_IDS)}")
    return dsir_log_weights(
        dsir_docs, target, buckets=BUCKETS, smoothing=SMOOTH,
        hasher="md5",
    )


def test_feature_hash_matches_reference(dsir_docs):
    got = sorted(
        (r.doc_id, r.b)
        for r in hashed_features(dsir_docs, BUCKETS,
                                 hasher="md5").collect()
    )
    ref = sorted(
        (i, b) for i, t in DSIR_CORPUS for b in _feats(t)
    )
    assert got == ref


def test_log_weights_match_reference(weights):
    ref = _ref_logw(DSIR_CORPUS, TARGET_IDS)
    got = {r.doc_id: r.log_w for r in weights.collect()}
    assert set(got) == set(ref)
    for i in ref:
        assert got[i] == pytest.approx(ref[i], rel=1e-12), i


def test_target_like_docs_outweigh_off_target(weights):
    got = {r.doc_id: r.log_w for r in weights.collect()}
    # every target-flavored doc beats every off-target doc
    assert min(got[i] for i in (1, 2, 6)) > max(got[i] for i in (3, 4))


def test_resample_is_deterministic_gumbel_topk(weights):
    ref = _ref_logw(DSIR_CORPUS, TARGET_IDS)
    keys = {}
    for i, w in ref.items():
        u = (_md5_60(f"{i}:dsir:{SEED}") + 0.5) / float(1 << 60)
        keys[i] = w - math.log(-math.log(u))
    want = [i for i, _ in sorted(keys.items(),
                                 key=lambda kv: (-kv[1], kv[0]))][:3]
    got1 = sorted(r.doc_id for r in dsir_resample(weights, 3, SEED).collect())
    got2 = sorted(r.doc_id for r in dsir_resample(weights, 3, SEED).collect())
    assert got1 == got2 == sorted(want)


def test_target_within_matches_default_path_exactly(dsir_docs, weights):
    """target_within=True (the target multinomial folded from the
    persisted candidate feature table through an id semi-join) must
    reproduce the re-hashing default bit-for-bit — same (id, b) rows
    aggregated either way (r14 optimization round, session 3)."""
    target = dsir_docs.where(f"doc_id IN {tuple(TARGET_IDS)}")
    got = {r.doc_id: r.log_w for r in dsir_log_weights(
        dsir_docs, target, buckets=BUCKETS, smoothing=SMOOTH,
        hasher="md5", target_within=True,
    ).collect()}
    ref = {r.doc_id: r.log_w for r in weights.collect()}
    assert got == ref  # exact equality, not approx


def test_dsir_rejects_nonpositive_smoothing(dsir_docs):
    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_weights(dsir_docs, dsir_docs, smoothing=0.0)


def test_hashed_features_rejects_unknown_hasher(dsir_docs):
    with pytest.raises(ValueError, match="hasher"):
        hashed_features(dsir_docs, BUCKETS, hasher="crc32").collect()


def test_production_hasher_ranks_same_direction(dsir_docs):
    """The xxhash64 production tier is a different bucket assignment,
    not a different algorithm: target-flavored docs must still
    outweigh off-target ones."""
    target = dsir_docs.where(f"doc_id IN {tuple(TARGET_IDS)}")
    got = {r.doc_id: r.log_w for r in dsir_log_weights(
        dsir_docs, target, buckets=BUCKETS, smoothing=SMOOTH
    ).collect()}
    assert min(got[i] for i in (1, 2, 6)) > max(got[i] for i in (3, 4))
