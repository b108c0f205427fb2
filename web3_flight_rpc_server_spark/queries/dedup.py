"""Deduplication queries (north-star C10/C11) over documents.

The exact tiers (hash dedup, pairwise n-gram Jaccard) are oracle
checked against DuckDB. The sketch tiers (MinHash-LSH, SimHash) are
rows-only — their hash values are engine-specific — but each is
verified in tests/test_dedup.py against the exact tier (recall of the
true near-dup pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..registry import query
from ..sources import tables

_JACCARD_ORACLE = """
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1, d2,
           floor((i * 1.0 / (s1.n + s2.n - i)) * 10000 + 0.5) / 10000 AS jaccard
    FROM inter
    JOIN sz s1 ON d1 = s1.doc_id
    JOIN sz s2 ON d2 = s2.doc_id
    WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.3
"""


@query(
    "q_dedup",
    oracle="""
    SELECT min(doc_id)             AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           md5(text)                AS text_hash
    FROM documents
    GROUP BY text
    """,
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup keeping the smallest doc_id per distinct
    text (C10). One hash-shuffle on the content key; at 100 TB, group
    on md5(text) instead of the full text to shrink shuffle payload."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, key_col="text", id_col="doc_id")


@query("q_dedup_jaccard", oracle=_JACCARD_ORACLE, declared=False)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard >= 0.3 (C11 ground truth). The
    corpus has a clean margin at this threshold (near-dup pairs sit
    above 0.5, everything else below 0.1 — checked in data).

    Undeclared since round 2: its driver slot went to the cluster
    stage (q_dedup_clusters), which consumes this pair graph and so
    re-verifies it transitively; the pair-level oracle itself stays
    driver-checked through q_minhash_lsh (same SQL) and this query
    remains bench/pytest-run."""
    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    return pairs.select("d1", "d2", round4(pairs.jaccard).alias("jaccard"))


_CLUSTERS_ORACLE = """
    WITH RECURSIVE tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT d1, d2
        FROM inter
        JOIN sz s1 ON d1 = s1.doc_id
        JOIN sz s2 ON d2 = s2.doc_id
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.3
    ),
    edges AS (
        SELECT d1 AS s, d2 AS d FROM pairs
        UNION ALL
        SELECT d2, d1 FROM pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach
    GROUP BY node
"""


@query("q_dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: exact-Jaccard pairs -> connected
    components -> (doc_id, cluster_id = min doc id in component) —
    the pairs->clusters->canonical stage that finishes a dedup
    pipeline (operators/components.py; min-label propagation,
    O(diameter) rounds, one node-keyed shuffle join + aggregate per
    round). Oracle: DuckDB WITH RECURSIVE transitive closure over the
    identical pair SQL."""
    from ..operators.components import connected_components

    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    comp = connected_components(pairs)
    return comp.select(F.col("node").alias("doc_id"), "cluster_id")


@query("q_minhash_lsh", oracle=_JACCARD_ORACLE)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 8-band LSH near-dup candidates, exact-verified at
    Jaccard >= 0.3 (C11 scale path).

    Oracle-checked against the EXACT pairwise-Jaccard SQL: candidates
    are verified with true Jaccard before emission (precision 1 by
    construction), and on this corpus the banded recall is complete —
    every true pair sits at J >= 0.5 where >=1-band collision
    probability is high, and the fixed-seed xxhash signatures make the
    result deterministic (verified equal to the exact tier at sf0.001
    and sf0.01). The recall floor is additionally asserted
    corpus-independently in tests/test_dedup.py."""
    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.3)
    return pairs.select("d1", "d2", round4(pairs.jaccard).alias("jaccard"))


def winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash, windowed minima) substring
    overlap pairs — detects shared passages rather than whole-doc
    near-dups; stop-fingerprint df-cap prevents join skew
    (operators/winnowing.py). Not a registry entry: its xxhash
    fingerprints admit no SQL oracle and the driver window is budgeted
    for oracle-backed queries; guarantees are pytest-asserted in
    tests/test_winnowing_ivf.py."""
    from ..operators.winnowing import fingerprint_overlap_pairs

    docs = tables.load_table(spark, sf_dir, "documents")
    return fingerprint_overlap_pairs(docs, min_shared=5)


def simhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs within Hamming distance 3, candidate
    generation via 16-bit chunk blocking (pigeonhole exact for <=3).
    Not a registry entry (engine-specific fingerprints, no SQL
    oracle); blocking exactness asserted in tests/test_dedup.py."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)
