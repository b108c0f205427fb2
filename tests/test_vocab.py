"""Vocabulary building and OOV acceptance (operators/vocab.py)."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.vocab import (
    build_vocabulary,
    oov_rate,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat dog cat"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_frequencies_rank_and_coverage(docs):
    v = build_vocabulary(docs, max_size=3).collect()
    assert [(r.rank, r.token, r.n) for r in v] == [
        (1, "cat", 3),       # count tie with 'the': token asc breaks it
        (2, "the", 3),
        (3, "dog", 2),       # count tie with 'sat': token asc again
    ]
    # 12 total occurrences: 3/12, 6/12, 8/12
    assert [round(r.coverage, 6) for r in v] == [0.25, 0.5, round(8 / 12, 6)]


def test_full_vocab_coverage_reaches_one(docs):
    v = build_vocabulary(docs, max_size=100).collect()
    assert abs(v[-1].coverage - 1.0) < 1e-9
    assert len({r.token for r in v}) == len(v)


def test_oov_rate_against_truncated_vocab(docs, spark):
    v = build_vocabulary(docs, max_size=3)  # cat, the, dog
    rates = {r.doc_id: r for r in oov_rate(docs, v).collect()}
    assert rates[2].n_tokens == 3
    assert abs(rates[2].oov_frac - 1 / 3) < 1e-9      # 'sat' OOV
    assert rates[3].n_tokens == 3
    assert rates[3].oov_frac == 0.0                   # all in vocab
    assert rates[1].n_tokens == 6
    assert abs(rates[1].oov_frac - 3 / 6) < 1e-9      # sat, on, mat OOV
    assert (rates[5].n_tokens, rates[5].oov_frac) == (0, 0.0)  # null doc
    # doc 4 is the empty string: zero real tokens, defined OOV 0
    assert (rates[4].n_tokens, rates[4].oov_frac) == (0, 0.0)


def test_max_size_validated(docs):
    with pytest.raises(ValueError, match="max_size"):
        build_vocabulary(docs, 0)


def test_unigram_scoring_orders_common_above_rare(docs, spark):
    from web3_flight_rpc_server_spark.operators.vocab import (
        unigram_logprob_score,
    )

    v = build_vocabulary(docs, max_size=100)  # untruncated model
    probe = spark.createDataFrame(
        [
            (10, "the cat"),          # common tokens -> high score
            (11, "mat on"),           # rare tokens -> lower
            (12, "zzz qqq"),          # OOV -> floor
            (13, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_score(probe, v).collect()}
    assert rows[10].mean_logprob > rows[11].mean_logprob > rows[12].mean_logprob
    assert rows[12].mean_logprob == -20.0
    assert rows[13].mean_logprob is None and rows[13].n_tokens == 0
    # exact value: p(the)=3/12, p(cat)=3/12 -> mean log = log(1/4)
    import math

    assert abs(rows[10].mean_logprob - math.log(0.25)) < 1e-9
