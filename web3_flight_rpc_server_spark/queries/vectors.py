"""Similarity-search queries over the embeddings table (C12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..operators.ivf import ivf_topk
from ..operators.similarity import (
    cosine_topk,
    neardup_pairs_bruteforce,
    rp_lsh_neardup_pairs,
)
from ..registry import query
from ..sources import tables


@query(
    "q_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           floor((list_cosine_similarity(e.embedding::DOUBLE[],
                                         q.embedding::DOUBLE[]))
                 * 10000 + 0.5) / 10000 AS cos
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
             DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 against the vec_id=0 query vector —
    brute-force baseline (single scan + TakeOrdered; the corpus never
    shuffles). Higher-order-function math, no UDF."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0)
    topk = cosine_topk(emb.where(F.col("vec_id") != 0), qvec, k=10)
    return topk.select("vec_id", round4(topk.cos).alias("cos"))


@query(
    "q_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]))
                 * 10000 + 0.5) / 10000 AS cos
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= 0.3
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs at cosine >= 0.3 (the corpus
    maxes at ~0.51 so the threshold has margin). Brute-force tier;
    q_ann_lsh is the scale path."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    pairs = neardup_pairs_bruteforce(emb, threshold=0.3)
    return pairs.select("d1", "d2", round4(pairs.cos).alias("cos"))


@query("q_ivf_topk")  # rows-only: approximate by design (partial probe)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-10 against vec_id=0: nearest-anchor
    cell assignment (literal-anchor argmax, no shuffle), probe the 3
    closest of 8 cells -> ~3/8 of the corpus scanned. Exactness at
    full probe and partial-probe recall are asserted in
    tests/test_winnowing_ivf.py."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    topk = ivf_topk(
        emb.where(F.col("vec_id") != 0),
        emb.where(F.col("vec_id") == 0),
        k=10, n_cells=8, n_probe=3,
    )
    return topk.select("vec_id", round4(topk.cos).alias("cos"))


@query("q_ann_lsh")  # rows-only: bucket hashes are engine-specific
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH near-dup with exact verification at
    cosine >= 0.3 — the bucketed alternative to the quadratic brute
    force. 6 planes x 8 reps is tuned for this mid-cosine threshold
    (per-rep collision (1-acos(c)/pi)^6: ~0.05 at c=0.35 vs ~0.016 at
    c=0 -> ~8x candidate reduction at ~0.3 recall; for a true near-dup
    regime (c>=0.9) use more planes and recall approaches 1). Subset
    and identical-vector guarantees asserted in tests/test_similarity.py."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    pairs = rp_lsh_neardup_pairs(emb, threshold=0.3, planes=6, reps=8)
    return pairs.select("d1", "d2", round4(pairs.cos).alias("cos"))
