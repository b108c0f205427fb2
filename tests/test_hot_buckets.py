"""Hot-bucket quarantine in the blocked pair joins (VERDICT r4 #1).

A template-heavy corpus — hundreds of docs landing in ONE blocking
bucket — turns the LSH band join and the SimHash chunk join quadratic
inside that bucket. ``max_bucket`` must (a) exclude the pathological
buckets from the join, (b) leave disjoint true pairs untouched, and
(c) surface the quarantined buckets in an auditable ledger, mirroring
winnowing's ``max_df`` contract.
"""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.dedup import (
    agg_signatures,
    lsh_candidate_pairs,
    lsh_hot_buckets,
    minhash_lsh_dedup_pairs,
    shingle_sets,
    simhash_hot_buckets,
    simhash_pairs,
    simhash_pairs_hmsearch,
)

TEMPLATE = (
    "terms of service boilerplate page all rights reserved contact "
    "us privacy policy cookie notice copyright two thousand twenty"
)
# The planted pair: one appended token over a 36-token base measures
# SimHash Hamming 3 (within the radius) and n-gram Jaccard ~0.9 — a
# genuine near-dup far from the template, in 2-doc buckets of its own.
_PAIR_BASE = (
    "an entirely different document about distributed query engines "
    "and columnar execution with vectorized operators running whole "
    "stage code generation over arrow batches inside the java virtual "
    "machine while adaptive execution replans shuffles at runtime"
)
PAIR_A = _PAIR_BASE
PAIR_B = _PAIR_BASE + " depth"
N_TEMPLATE = 300


def _skew_corpus(spark):
    """N_TEMPLATE identical template docs (identical signature ->
    identical buckets in EVERY band/chunk: a deterministic engineered
    hot bucket) plus one genuine near-dup pair far from the template."""
    rows = [(i, TEMPLATE) for i in range(N_TEMPLATE)]
    rows += [(100001, PAIR_A), (100002, PAIR_B)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_hot_bucket_ledger_and_cap(spark):
    docs = _skew_corpus(spark)
    sigs = agg_signatures(shingle_sets(docs), 32)

    ledger = lsh_hot_buckets(sigs, bands=8, max_bucket=50).collect()
    # the template docs share every one of the 8 band buckets
    assert len(ledger) == 8
    assert all(r.n_docs == N_TEMPLATE for r in ledger)

    capped = lsh_candidate_pairs(sigs, 8, max_bucket=50)
    pairs = {(r.d1, r.d2) for r in capped.collect()}
    # the engineered bucket's ~N^2/2 template pairs are quarantined...
    assert len(pairs) <= 4, f"cap leaked quadratic candidates: {len(pairs)}"
    # ...while the disjoint true pair (its own 2-doc buckets) survives
    assert (100001, 100002) in pairs

    uncapped = lsh_candidate_pairs(sigs, 8, max_bucket=None).count()
    assert uncapped >= N_TEMPLATE * (N_TEMPLATE - 1) // 2


def test_lsh_end_to_end_with_cap(spark):
    docs = _skew_corpus(spark)
    verified = {
        (r.d1, r.d2)
        for r in minhash_lsh_dedup_pairs(
            docs, threshold=0.3, max_bucket=50
        ).collect()
    }
    assert verified == {(100001, 100002)}


def test_lsh_cap_above_population_is_identity(spark):
    docs = _skew_corpus(spark)
    sigs = agg_signatures(shingle_sets(docs), 32)
    capped = {
        (r.d1, r.d2)
        for r in lsh_candidate_pairs(sigs, 8, max_bucket=N_TEMPLATE).collect()
    }
    uncapped = {
        (r.d1, r.d2)
        for r in lsh_candidate_pairs(sigs, 8, max_bucket=None).collect()
    }
    assert capped == uncapped
    assert lsh_hot_buckets(sigs, 8, max_bucket=N_TEMPLATE).count() == 0


def test_simhash_hot_bucket_ledger_and_cap(spark):
    docs = _skew_corpus(spark)

    ledger = simhash_hot_buckets(docs, 3, max_bucket=50).collect()
    # identical fingerprints: all 4 chunks of the template are hot
    assert len(ledger) == 4
    assert all(r.n_docs == N_TEMPLATE for r in ledger)

    pairs = {
        (r.d1, r.d2)
        for r in simhash_pairs(docs, 3, max_bucket=50).collect()
    }
    assert len(pairs) <= 4, f"cap leaked quadratic candidates: {len(pairs)}"
    assert (100001, 100002) in pairs

    assert simhash_pairs(
        docs, 3, max_bucket=None
    ).count() >= N_TEMPLATE * (N_TEMPLATE - 1) // 2


def test_hmsearch_cap(spark):
    docs = _skew_corpus(spark)
    pairs = {
        (r.d1, r.d2)
        for r in simhash_pairs_hmsearch(docs, 3, max_bucket=50).collect()
    }
    assert len(pairs) <= 4
    assert (100001, 100002) in pairs


def test_degenerate_cap_raises(spark):
    docs = _skew_corpus(spark)
    sigs = agg_signatures(shingle_sets(docs), 32)
    with pytest.raises(ValueError, match="max_bucket"):
        lsh_candidate_pairs(sigs, 8, max_bucket=1).count()


def test_default_is_finite_and_matches_funnel_config():
    """The production pair entry points default to a FINITE cap
    (VERDICT r5 #1): a user calling minhash_pairs/simhash_pairs
    directly on a template-heavy 100 TB corpus gets the bounded path
    unless they explicitly opt out with max_bucket=None. The default
    agrees with the funnel's configured cap so the one-shot operators
    and the pipeline quarantine identically."""
    from web3_flight_rpc_server_spark.operators import dedup
    from web3_flight_rpc_server_spark.pipelines.curation import CurationConfig

    assert isinstance(dedup.DEFAULT_MAX_BUCKET, int)
    assert dedup.DEFAULT_MAX_BUCKET >= 2
    assert CurationConfig().lsh_max_bucket == dedup.DEFAULT_MAX_BUCKET


def test_default_path_bounds_candidates(spark, monkeypatch):
    """Calling the pair joins with NO max_bucket argument must bound
    the engineered hot bucket. DEFAULT_MAX_BUCKET is resolved at call
    time, so shrinking it lets the 300-doc skew corpus exercise the
    exact default code path (same plan, smaller threshold) without a
    >5000-doc fixture."""
    from web3_flight_rpc_server_spark.operators import dedup

    monkeypatch.setattr(dedup, "DEFAULT_MAX_BUCKET", 50)
    docs = _skew_corpus(spark)
    sigs = agg_signatures(shingle_sets(docs), 32)

    default_lsh = {(r.d1, r.d2) for r in lsh_candidate_pairs(sigs, 8).collect()}
    assert len(default_lsh) <= 4, f"default path leaked: {len(default_lsh)}"
    assert (100001, 100002) in default_lsh

    default_sim = {(r.d1, r.d2) for r in simhash_pairs(docs, 3).collect()}
    assert len(default_sim) <= 4
    assert (100001, 100002) in default_sim

    default_hm = {
        (r.d1, r.d2) for r in simhash_pairs_hmsearch(docs, 3).collect()
    }
    assert len(default_hm) <= 4
    assert (100001, 100002) in default_hm

    default_e2e = {
        (r.d1, r.d2)
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.3).collect()
    }
    assert default_e2e == {(100001, 100002)}
