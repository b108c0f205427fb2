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


def _uf_components(edges):
    """Ground-truth union-find for the Spark operator tests."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark):
    """Chains (diameter stress), triangles, isolated pairs, and a star
    — the Spark min-label propagation must equal union-find truth."""
    from web3_flight_rpc_server_spark.operators.components import (
        connected_components,
    )

    edges = (
        [(i, i + 1) for i in range(10, 18)]        # 9-node chain
        + [(1, 2), (2, 3), (1, 3)]                 # triangle
        + [(100, 200)]                             # isolated pair
        + [(50, x) for x in (51, 52, 53, 54)]      # star
    )
    truth = _uf_components(edges)
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    assert got == truth


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path (small graphs) and the
    distributed min-label loop (forced via driver_threshold=0) must
    produce identical labelings on the same graph."""
    from web3_flight_rpc_server_spark.operators.components import (
        connected_components,
    )

    edges = (
        [(i, i + 1) for i in range(10, 18)]
        + [(1, 2), (2, 3), (1, 3)]
        + [(100, 200)]
        + [(50, x) for x in (51, 52, 53, 54)]
    )
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    fast = {
        (r.node, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r.node, r.cluster_id)
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist == {
        (r.node, r.cluster_id)
        for r in connected_components(pairs).collect()
    }


def test_dedup_keep_canonical_drops_losers_only(spark, sf_dir):
    """Survivors = min-id doc of every near-dup cluster + all docs in
    no pair; cluster membership must collapse to one survivor each."""
    from web3_flight_rpc_server_spark.operators.components import (
        connected_components,
        dedup_keep_canonical,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    kept = dedup_keep_canonical(docs, pairs)
    comp = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    canonicals = set(comp.values())
    losers = {n for n, c in comp.items() if n != c}
    assert kept_ids == (all_ids - losers)
    assert canonicals <= kept_ids


def test_md5_bridge_hash_matches_duckdb(spark):
    """functions/hashing.py cross-engine contract: the 60-bit
    md5-prefix hash must be bit-identical in Spark and DuckDB for
    ASCII, UTF-8 multibyte, quotes, and the empty string — this is
    what lets q_simhash / q_winnow_overlap carry true SQL oracles."""
    import duckdb

    from web3_flight_rpc_server_spark.functions import (
        MD5_PREFIX60_SQL,
        md5_prefix60,
    )

    vals = ["hello", "WORLD", "café", "123", "'s", " ", "", "a b'c\"d"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", md5_prefix60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT " + MD5_PREFIX60_SQL.format("?"), [v]
        ).fetchone()[0]
        assert got[v] == want, (v, got[v], want)
        assert 0 <= got[v] < 2 ** 60


def test_simhash_md5_tier_blocking_is_exact(spark, sf_dir):
    """The declared q_simhash uses the md5-bridge hash; its 16-bit
    chunk blocking must lose nothing vs brute-force all-pairs at
    hamming <= 3 (pigeonhole exactness, asserted per hash tier)."""
    from web3_flight_rpc_server_spark.functions import md5_prefix60
    from web3_flight_rpc_server_spark.operators.dedup import simhash64

    docs = tables.load_table(spark, sf_dir, "documents")
    blocked = {
        (r.d1, r.d2, r.hamming)
        for r in simhash_pairs(docs, 3, hash_fn=md5_prefix60).collect()
    }
    sh = simhash64(docs, hash_fn=md5_prefix60)
    l, r = sh.alias("l"), sh.alias("r")
    brute = {
        (row.d1, row.d2, row.hamming)
        for row in (
            l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("d1"),
                F.col("r.doc_id").alias("d2"),
                F.bit_count(
                    F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
                ).alias("hamming"),
            )
            .where(F.col("hamming") <= 3)
        ).collect()
    }
    assert blocked == brute


def test_simhash_blocking_exact_at_wider_radii(spark, sf_dir):
    """The generalized chunk blocking (max_hamming+1 disjoint chunks)
    must stay pigeonhole-exact at radii beyond the classic 3: blocked
    pairs == brute-force all-pairs at Hamming <= 7 and <= 0."""
    from web3_flight_rpc_server_spark.functions import md5_prefix60
    from web3_flight_rpc_server_spark.operators.dedup import simhash64

    docs = tables.load_table(spark, sf_dir, "documents")
    sh = simhash64(docs, hash_fn=md5_prefix60)
    l, r = sh.alias("l"), sh.alias("r")
    all_pairs = (
        l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("d1"),
            F.col("r.doc_id").alias("d2"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
    )
    for radius in (0, 7):
        blocked = {
            (p.d1, p.d2, p.hamming)
            for p in simhash_pairs(
                docs, radius, hash_fn=md5_prefix60
            ).collect()
        }
        brute = {
            (p.d1, p.d2, p.hamming)
            for p in all_pairs.where(F.col("hamming") <= radius).collect()
        }
        assert blocked == brute, f"radius {radius}"


def test_hmsearch_pair_blocking_exact_and_matches_classic(spark, sf_dir):
    """The HmSearch-style pair-of-chunks blocking (the documented
    >10^7-doc escalation) must be pigeonhole-exact: identical pairs to
    brute-force all-pairs — and hence to the classic single-chunk
    blocking — at several radii and chunk counts, including a
    non-default m with remainder bits in the last chunk."""
    from web3_flight_rpc_server_spark.functions import md5_prefix60
    from web3_flight_rpc_server_spark.operators.dedup import (
        simhash64,
        simhash_pairs_hmsearch,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    sh = simhash64(docs, hash_fn=md5_prefix60)
    l, r = sh.alias("l"), sh.alias("r")
    all_pairs = (
        l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("d1"),
            F.col("r.doc_id").alias("d2"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
    )
    for radius, m in ((3, None), (3, 7), (7, 9), (0, 2)):
        got = {
            (p.d1, p.d2, p.hamming)
            for p in simhash_pairs_hmsearch(
                docs, radius, n_chunks=m, hash_fn=md5_prefix60
            ).collect()
        }
        brute = {
            (p.d1, p.d2, p.hamming)
            for p in all_pairs.where(F.col("hamming") <= radius).collect()
        }
        assert got == brute, f"radius {radius}, n_chunks {m}"


def test_hmsearch_rejects_underchunked_layouts(spark, sf_dir):
    import pytest

    from web3_flight_rpc_server_spark.operators.dedup import (
        simhash_pairs_hmsearch,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="pair blocking"):
        simhash_pairs_hmsearch(docs, 3, n_chunks=4)


def test_components_deep_chain_converges_in_log_rounds(spark):
    """Pointer jumping bounds the distributed loop at O(log diameter):
    a 500-node path graph must converge well within 12 rounds (plain
    neighbor propagation would need ~500) and still label every node
    with the component minimum. driver_threshold=0 forces the
    distributed loop."""
    from web3_flight_rpc_server_spark.operators.components import (
        connected_components,
    )

    n = 500
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components(
            pairs, max_iter=12, driver_threshold=0
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_containment_catches_short_inside_long(spark):
    """A short doc quoted whole inside a long one: containment ~1.0
    in the short->long direction, while Jaccard sits far below any
    useful threshold — the case the symmetric tiers structurally
    miss."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        release_caches,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),                          # the short original
            (2, f"{filler} {quote} {filler}"),   # quotes it whole
            (3, "totally unrelated text about nothing in particular"),
        ],
        "doc_id long, text string",
    )
    try:
        got = {
            (r.src, r.dst): r.containment
            for r in ngram_containment_pairs(docs, threshold=0.8).collect()
        }
        assert (1, 2) in got and got[(1, 2)] == 1.0
        assert (2, 1) not in got          # big is NOT inside small
        assert not any(3 in k for k in got)
        jac = ngram_jaccard_pairs(docs, threshold=0.3).collect()
        assert not jac                    # Jaccard misses the pair
    finally:
        release_caches()


def test_containment_directed_both_ways_for_copies(spark):
    from web3_flight_rpc_server_spark.operators.dedup import (
        ngram_containment_pairs,
        release_caches,
    )

    t = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    try:
        got = {(r.src, r.dst): r.containment
               for r in ngram_containment_pairs(docs, 0.9).collect()}
        assert got == {(1, 2): 1.0, (2, 1): 1.0}
    finally:
        release_caches()
