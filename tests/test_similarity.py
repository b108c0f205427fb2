"""RP-LSH similarity verification.

Sign-LSH separates high-cosine pairs cheaply; at low thresholds it
trades recall for candidate reduction (per-rep collision for cosine c
is (1-acos(c)/pi)^planes). The corpus tops out at cosine ~0.51, so the
deterministic guarantees are tested with injected identical vectors
(same vector -> same buckets in every rep -> always a candidate) and
the statistical behavior with floors far below expectation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.similarity import (
    neardup_pairs_bruteforce,
    rp_lsh_neardup_pairs,
)
from web3_flight_rpc_server_spark.sources import tables


def test_rp_lsh_candidates_verified_exact(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    pairs = rp_lsh_neardup_pairs(emb, threshold=0.3, planes=6, reps=8).collect()
    assert all(p.cos >= 0.3 for p in pairs)


def test_rp_lsh_is_subset_of_exact(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    exact = {(r.d1, r.d2) for r in neardup_pairs_bruteforce(emb, 0.3).collect()}
    approx = {
        (r.d1, r.d2)
        for r in rp_lsh_neardup_pairs(emb, 0.3, planes=6, reps=8).collect()
    }
    assert approx <= exact, "verified LSH output must be a subset of exact pairs"


def test_rp_lsh_finds_identical_vectors(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    copies = emb.where(F.col("vec_id") < 25).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    found = {
        (r.d1, r.d2)
        for r in rp_lsh_neardup_pairs(
            emb.unionByName(copies), threshold=0.99, planes=12, reps=4
        ).collect()
    }
    expected = {(i, i + 100000) for i in range(25)}
    missing = expected - found
    assert not missing, f"identical vectors missed: {sorted(missing)[:5]}"


def test_cosine_topk_arrow_matches_hof(spark, sf_dir):
    """The Arrow-vectorized tier returns the same top-k ids as the
    HOF tier with value agreement to 1e-9 (BLAS vs sequential fold
    summation-order differences only)."""
    from web3_flight_rpc_server_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_arrow,
    )

    emb = tables.load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0)
    hof = {r.vec_id: r.cos for r in cosine_topk(corpus, query, k=10).collect()}
    arrow = {
        r.vec_id: r.cos
        for r in cosine_topk_arrow(corpus, query, k=10).collect()
    }
    assert set(hof) == set(arrow)
    for vid, cos in hof.items():
        assert abs(cos - arrow[vid]) < 1e-9


def test_centroid_and_drift(spark):
    from web3_flight_rpc_server_spark.operators.similarity import (
        centroid,
        embedding_drift,
    )

    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [2.0, 2.0])],
        "id long, embedding array<double>",
    )
    c = centroid(a).collect()[0]
    assert c.centroid == [2.0, pytest.approx(2 / 3)]
    assert c.n_vectors == 3
    # identical populations: cosine 1; orthogonal shift: cosine ~0
    same = embedding_drift(a, a).collect()[0]
    assert same.centroid_cosine == pytest.approx(1.0)
    b = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.0, 2.0])],
        "id long, embedding array<double>",
    )
    a_axis = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0])],
        "id long, embedding array<double>",
    )
    cross = embedding_drift(a_axis, b).collect()[0]
    assert cross.centroid_cosine == pytest.approx(0.0)
    assert (cross.n_a, cross.n_b) == (2, 2)


def test_drift_grouped_plan_has_no_dead_broadcast_hint(spark):
    """Grouped drift is a full_outer join, which BroadcastHashJoin
    cannot build — the r4 plan carried a broadcast hint Spark silently
    ignored. Pin the honest shape: a full-outer SortMergeJoin over the
    tiny centroid tables, no nested-loop fallback."""
    from web3_flight_rpc_server_spark.operators.similarity import (
        embedding_drift,
    )

    a = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("y", [3.0, 0.0])],
        "g string, embedding array<double>",
    )
    b = spark.createDataFrame(
        [("x", [0.0, 1.0]), ("z", [0.0, 2.0])],
        "g string, embedding array<double>",
    )
    drift = embedding_drift(a, b, group_cols=["g"])
    plan = drift._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # outer-only groups surface with a null cosine, not a dropped row
    rows = {r.g: r for r in drift.collect()}
    assert set(rows) == {"x", "y", "z"}
    assert rows["y"].centroid_cosine is None
    assert rows["z"].centroid_cosine is None
