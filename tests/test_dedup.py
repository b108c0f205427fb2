"""Sketch-tier dedup verification.

The sketch tiers (MinHash-LSH, SimHash) can't be oracle-checked (hash
values are engine-specific), so they're verified against constructed
ground truth and the exact Jaccard tier:

- injected exact duplicates MUST be recovered (deterministic property)
- LSH candidates that pass verification are exact by construction
- statistical recall floors sit well under the theoretical expectation
  so they don't flake (banded MinHash at j~0.99: p ~ 1-(1-0.99^4)^8)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.dedup import (
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from web3_flight_rpc_server_spark.sources import tables


def _with_injected_copies(docs, id_offset=100000, n=30):
    copies = docs.where(F.col("doc_id") < n).withColumn(
        "doc_id", F.col("doc_id") + id_offset
    )
    return docs.unionByName(copies)


def test_minhash_lsh_recovers_true_near_dups(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    truth = {
        (r.d1, r.d2)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    found = {
        (r.d1, r.d2)
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.3).collect()
    }
    assert truth, "corpus should contain true near-dup pairs"
    # per-pair collision p at j>=0.9 is ~1-(1-0.9^4)^8 ~ 0.998; the
    # corpus' near-dups sit near 0.95+, so full recall is expected.
    missing = truth - found
    assert not missing, f"LSH missed true near-dups: {sorted(missing)[:5]}"


def test_minhash_lsh_finds_injected_exact_copies(spark, sf_dir):
    docs = _with_injected_copies(tables.load_table(spark, sf_dir, "documents"))
    found = {
        (r.d1, r.d2)
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.9).collect()
    }
    # identical text -> identical signature -> identical band buckets:
    # recovery is deterministic, not probabilistic.
    expected = {(i, i + 100000) for i in range(30)}
    missing = expected - found
    assert not missing, f"missed injected copies: {sorted(missing)[:5]}"


def test_minhash_lsh_verification_is_exact(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.3).collect()
    assert all(p.jaccard >= 0.3 for p in pairs)


def test_simhash_finds_injected_exact_copies(spark, sf_dir):
    docs = _with_injected_copies(tables.load_table(spark, sf_dir, "documents"))
    found = {(r.d1, r.d2): r.hamming for r in simhash_pairs(docs, 3).collect()}
    for i in range(30):
        assert found.get((i, i + 100000)) == 0, f"doc {i}: copy not at hamming 0"


def test_simhash_recall_and_precision_floors(spark, sf_dir):
    """SimHash(unigram, 64-bit) at hamming<=3 on short synthetic docs:
    empirically ~0.75 recall vs jaccard>=0.95 truth and a few short-doc
    false positives — assert loose floors, not perfection (short docs
    have many zero-sum bits, which makes the fingerprint unstable;
    that's inherent to SimHash, not a bug)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    truth = {
        (r.d1, r.d2)
        for r in ngram_jaccard_pairs(docs, threshold=0.95).collect()
    }
    jac_any = {
        (r.d1, r.d2): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    found = {(r.d1, r.d2) for r in simhash_pairs(docs, 3).collect()}
    assert truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f}"
    precision_ok = sum(1 for p in found if jac_any.get(p, 0.0) >= 0.5)
    assert precision_ok / len(found) >= 0.5, "too many short-doc collisions"
