"""Declared end-to-end curation funnel (C25 + the C13/C10/C11/C20
composition): every document routed to its first failing gate — or
'kept' — with the ENTIRE funnel verified per-document against a
single DuckDB oracle.

The declared funnel runs the PRODUCTION near-dup tier — MinHash-LSH
(pairs_fn=None), the 100 TB code path — while the oracle rebuilds the
ground truth with exact pairwise Jaccard: lang-ID, the rounded
quality score, windowed exact dedup, pairwise Jaccard +
WITH RECURSIVE connected components, survivor-scoped decontamination,
and the blocklist probe, then routes each doc through the same CASE
ladder. The cross-tier comparison is sound because LSH candidates are
exact-verified before rejecting (precision 1) and q_minhash_lsh
independently proves the LSH pair set equals the exact pair set on
this corpus; tests/test_curation.py additionally pins per-document
routing parity between the two tiers, and tests/test_plans.py asserts
the declared plan carries the LSH banding (posexplode), not the
quadratic shingle self-join.
Each fragment mirrors an independently driver-verified query
(q_text_stats, q_dedup, q_minhash_lsh/_JACCARD_ORACLE,
q_dedup_clusters, q_contamination, q_blocklist_filter) — this entry
verifies their COMPOSITION, including the stage-scoping rules (later
gates only see earlier survivors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, stopword_hits_sql
from ..pipelines.curation import CurationConfig, curation_rejects
from ..registry import query
from ..sources import tables


def _semantic_ctes(threshold: float, n_cells: int, top_m: int) -> str:
    """The semantic_dup gate's CTE block, spliced into the funnel
    oracle between the lexical components and the decontamination
    scope: survivor-scoped embeddings, the _semdedup_oracle blocking
    (bit-replicated anchors), the cosine_fold_sql verify, a second
    recursive closure, and s4b = the semantic survivors.

    The recursion inputs are AS MATERIALIZED: DuckDB inlines
    single-use CTEs, so an un-hinted ``semedges`` would re-evaluate
    the whole candidate-generation + 192-term fold-verify chain on
    EVERY recursion iteration — measured 943 s -> 10 s at sf0.001 on
    a long-diameter pair graph (this fixture's 0.3-threshold pairs
    form chains, so the closure iterates ~diameter times)."""
    from ..operators.ivf import cell_scores_sql
    from ..operators.similarity import cosine_fold_sql

    scores = cell_scores_sql("embedding", n_cells)
    cos = cosine_fold_sql("e1.embedding", "e2.embedding", 64)
    return f"""
    sememb AS (
        SELECT s4.doc_id, e.embedding
        FROM s4 JOIN embeddings e ON e.vec_id = s4.doc_id
    ),
    semscored AS (SELECT doc_id, {scores} AS s FROM sememb),
    semtopm AS (
        SELECT doc_id, cell FROM (
            SELECT doc_id, (u.i - 1) AS cell,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY s[u.i] DESC, u.i ASC
                   ) AS rk
            FROM semscored, UNNEST(range(1, {n_cells + 1})) AS u(i)
        ) ranked
        WHERE rk <= {top_m}
    ),
    semcand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM semtopm a JOIN semtopm b
          ON a.cell = b.cell AND a.doc_id < b.doc_id
    ),
    sempairs AS MATERIALIZED (
        SELECT c.d1, c.d2
        FROM semcand c
        JOIN sememb e1 ON e1.doc_id = c.d1
        JOIN sememb e2 ON e2.doc_id = c.d2
        WHERE {cos} >= {threshold}
    ),
    semedges AS MATERIALIZED (
        SELECT d1 AS s, d2 AS d FROM sempairs
        UNION ALL SELECT d2, d1 FROM sempairs
    ),
    semreach(node, label) AS (
        SELECT s, s FROM semedges
        UNION
        SELECT e.d, r.label FROM semreach r JOIN semedges e ON e.s = r.node
    ),
    semcomp AS (
        SELECT node, min(label) AS cluster FROM semreach GROUP BY node
    ),
    s4b AS (
        SELECT s4.* FROM s4 LEFT JOIN semcomp ON semcomp.node = s4.doc_id
        WHERE semcomp.node IS NULL OR s4.doc_id = semcomp.cluster
    ),"""


def _funnel_oracle(semantic: bool = False,
                   semantic_threshold: float = 0.3,
                   n_cells: int = 8, top_m: int = 2) -> str:
    """The per-document funnel routing twin. ``semantic=True`` inserts
    the optional semantic_dup gate between near_dup and contaminated:
    the survivor-scoped embeddings (vec_id == doc_id on the fixture
    tables) get the SAME bit-replicated SemDeDup blocking as
    _semdedup_oracle (cell_scores_sql anchors) and the fold-twin
    verify (cosine_fold_sql), a second recursive transitive closure
    labels semantic clusters, the decontamination stage re-scopes to
    the semantic survivors, and the CASE ladder gains the
    semantic_dup arm — so a hash match covers the composed funnel
    INCLUDING the gate's position and scoping."""
    hits = {lang: stopword_hits_sql("ts", lang) for lang in STOPWORDS}
    semantic_case = (
        "WHEN sc.node IS NOT NULL AND g.doc_id <> sc.cluster "
        "THEN 'semantic_dup'" if semantic else ""
    )
    semantic_join = (
        "LEFT JOIN semcomp sc ON sc.node = g.doc_id" if semantic else ""
    )
    quality4 = """floor((
          0.5 * least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0)
        + 0.4 * (CAST(len(list_distinct(ts)) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE))
        + 0.1 * (1.0 - least(10.0 * CAST(len(regexp_extract_all(text,
                 '[^a-zA-Z0-9 ]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 1.0))
    ) * 10000 + 0.5) / 10000"""
    return f"""
    WITH RECURSIVE gate AS (
        SELECT doc_id, text, ts,
               CASE
                 WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                 WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
                 WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
                 WHEN h_fr >= h_es THEN 'fr'
                 ELSE 'es'
               END AS lang_pred,
               {quality4} AS q4,
               list_has_any(ts, ['slow', 'big']) AS blocked
        FROM (
            SELECT doc_id, text, ts,
                   {hits['en']} AS h_en, {hits['de']} AS h_de,
                   {hits['fr']} AS h_fr, {hits['es']} AS h_es
            FROM (SELECT doc_id, text,
                         string_split(lower(text), ' ') AS ts
                  FROM documents)
        )
    ),
    s2 AS (SELECT * FROM gate WHERE lang_pred = 'en' AND q4 >= 0.5),
    exact AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM s2
    ),
    s3 AS (SELECT s2.* FROM s2 JOIN exact USING (doc_id)
           WHERE doc_id = keep),
    sh AS (
        SELECT DISTINCT doc_id,
               ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM s3, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
        SELECT d1, d2 FROM inter
        JOIN szs z1 ON d1 = z1.doc_id
        JOIN szs z2 ON d2 = z2.doc_id
        WHERE i * 1.0 / (z1.n + z2.n - i) >= 0.3
    ),
    edges AS MATERIALIZED (
        SELECT d1 AS s, d2 AS d FROM pairs
        UNION ALL SELECT d2, d1 FROM pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
    s4 AS (
        SELECT s3.* FROM s3 LEFT JOIN comp ON comp.node = s3.doc_id
        WHERE comp.node IS NULL OR s3.doc_id = comp.cluster
    ),{_semantic_ctes(semantic_threshold, n_cells, top_m) if semantic else '''
    s4b AS (SELECT * FROM s4),'''}
    bk AS (
        SELECT doc_id,
               instr('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS bucket
        FROM s4b
    ),
    sh4 AS (SELECT sh.doc_id, shingle FROM sh JOIN s4b USING (doc_id)),
    bench AS (SELECT DISTINCT shingle FROM sh4 JOIN bk USING (doc_id)
              WHERE bucket = 15),
    corp AS (SELECT sh4.doc_id, shingle FROM sh4 JOIN bk USING (doc_id)
             WHERE bucket <> 15),
    csz AS (SELECT doc_id, count(*) AS n FROM corp GROUP BY doc_id),
    hit AS (SELECT corp.doc_id, count(*) AS c
            FROM corp JOIN bench USING (shingle) GROUP BY corp.doc_id),
    contam AS (SELECT hit.doc_id FROM hit JOIN csz USING (doc_id)
               WHERE c * 1.0 / n >= 0.5)
    SELECT g.doc_id,
           CASE
             WHEN g.lang_pred <> 'en' THEN 'lang'
             WHEN g.q4 < 0.5 THEN 'quality'
             WHEN e.keep IS NOT NULL AND g.doc_id <> e.keep THEN 'exact_dup'
             WHEN c.node IS NOT NULL AND g.doc_id <> c.cluster THEN 'near_dup'
             {semantic_case}
             WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
             WHEN g.blocked THEN 'blocklist'
             ELSE 'kept'
           END AS stage
    FROM gate g
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN comp c ON c.node = g.doc_id
    {semantic_join}
    LEFT JOIN contam ct ON ct.doc_id = g.doc_id
    """


@query("q_curation_semantic", oracle=_funnel_oracle(semantic=True))
def q_curation_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel WITH the r9 semantic_dup gate, per-doc routing
    oracle-checked end to end: embeddings join documents on
    vec_id == doc_id (the fixture tables are 1:1), the gate runs at
    threshold 0.3 / top-2-of-8 (the q_semantic_dedup operating point,
    so the blocking is the oracle-replicable untrained-anchor tier),
    and the DuckDB twin recomputes the ENTIRE ladder — lexical gates,
    both recursive closures, the fold-twin cosine verify, the
    re-scoped decontamination — per document. DECLARED since r10 (the
    r10 rotation: took q_pivot's slot — the semantic-gated funnel is
    the production shape for embedding corpora and deserves the
    driver's hash check). Exact-Jaccard pairs_fn for the lexical
    tier, same cross-tier soundness note as q_curation_funnel."""
    from ..operators.dedup import ngram_jaccard_pairs, release_caches

    docs = tables.load_table(spark, sf_dir, "documents")
    emb = tables.load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    cfg = CurationConfig(semantic_threshold=0.3)
    try:
        rejects = curation_rejects(
            docs, cfg,
            pairs_fn=lambda d: ngram_jaccard_pairs(d, threshold=0.3),
            embeddings=emb,
        )
        out = docs.join(rejects, "doc_id", "left").select(
            "doc_id",
            F.coalesce("reject_reason", F.lit("kept")).alias("stage"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        release_caches()
    return out


@query("q_curation_funnel", oracle=_funnel_oracle())
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's funnel routing (first failing gate or 'kept'),
    production MinHash-LSH near-dup tier (pairs_fn=None — the scale
    shape). The oracle's exact-Jaccard ground truth stays valid
    because LSH candidates are exact-verified (precision 1) and the
    tiers' pair sets/routing agree on this corpus (q_minhash_lsh,
    tests/test_curation.py). The exact tier remains available as
    ngram_jaccard_pairs for ground-truth runs; the writer/split path
    is covered by pipelines/curation.py + tests/test_curation.py."""
    docs = tables.load_table(spark, sf_dir, "documents")
    rejects = curation_rejects(docs, CurationConfig(), pairs_fn=None)
    return docs.join(rejects, "doc_id", "left").select(
        "doc_id",
        F.coalesce("reject_reason", F.lit("kept")).alias("stage"),
    )
