"""Deduplication queries (north-star C10/C11) over documents.

Every tier is oracle-checked against DuckDB: the exact tiers (hash
dedup, pairwise n-gram Jaccard) directly; MinHash-LSH against the
exact-Jaccard SQL (candidates are exact-verified, banded recall is
complete on this corpus); SimHash and winnowing via the md5-bridge
hash (functions/hashing.py) that both engines compute bit-identically,
so the DuckDB twin recomputes the very same fingerprints and checks
the blocked pair generation by brute force. Each sketch tier is
additionally verified corpus-independently in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import MD5_PREFIX60_SQL, md5_prefix60, round4
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from ..registry import query
from ..sources import tables
from ..functions.localdf import local_df

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
    corpus-independently in tests/test_dedup.py, and the
    corpus-independent CONTRACT — precision 1 with exact Jaccard
    values, certain recall of identical-text pairs — is fuzzed on
    generated corpora in tests/test_oracle_fuzz.py (banding recall
    near the threshold is probabilistic on arbitrary corpora; set
    equality with the exact oracle is a property of this corpus's
    high-J near-dup structure, not of LSH)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    # max_bucket=None: the oracle twin is EXACT banded semantics at any
    # sf — the production default (DEFAULT_MAX_BUCKET) would quarantine
    # buckets the brute-force SQL still joins.
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.3, max_bucket=None)
    return pairs.select("d1", "d2", round4(pairs.jaccard).alias("jaccard"))


def _simhash_oracle(max_hamming: int = 3, n_bits: int = 60) -> str:
    """All-pairs SimHash SQL twin over the md5-bridge hash.

    Recomputes the full fingerprint pipeline in DuckDB — tokenize,
    60-bit md5-prefix token hash (functions/hashing.py, bit-identical
    to the Spark column), 60 conditional-sum bit votes, fingerprint
    fold, then brute-force bit_count(xor) over all pairs. The Spark
    side blocks candidates on 16-bit chunks (pigeonhole-exact for
    Hamming <= 3), so a hash match proves the BLOCKING loses nothing,
    not just that the fingerprint math agrees. Bits 60-63 of the hash
    are always 0, so their vote sums are -n_tokens < 0 and those
    fingerprint bits are 0 on both sides — the oracle only materializes
    the 60 live bits."""
    return f"""
    {_simhash_fp_cte(n_bits)}
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _simhash_fp_cte(n_bits: int = 60) -> str:
    """The shared WITH-prefix ending in ``fp(doc_id, simhash)`` —
    the DuckDB recomputation of simhash64 over the md5-bridge hash,
    used by both the all-pairs oracle and the index-probe oracle."""
    h = MD5_PREFIX60_SQL.format("tok")
    sums = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) AS s{b}"
        for b in range(n_bits)
    )
    fold = " + ".join(
        f"(case when s{b} > 0 then {2 ** b} else 0 end)" for b in range(n_bits)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, {h} AS h FROM tok),
    sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fold} AS BIGINT) AS simhash FROM sums)"""


@query("q_simhash", oracle=_simhash_oracle())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs within Hamming distance 3 (C11 sketch
    tier): per-token hash, 64 conditional-sum bit votes in ONE groupBy
    (map-side partials, single shuffle), then candidate generation by
    16-bit chunk blocking — a pair within Hamming <= 3 must agree
    exactly on >= 1 of 4 chunks (pigeonhole), so the join is a bucket
    equi-join, never all-pairs — and an in-row bit_count(xor) verify.

    Declared with the md5-bridge hash (functions/hashing.py) so the
    DuckDB oracle can recompute the identical fingerprints and check
    the pairs by brute force; production callers keep the xxhash64
    default (same plan, cheaper hash). Blocking exactness is also
    asserted corpus-independently in tests/test_dedup.py."""
    docs = tables.load_table(spark, sf_dir, "documents")
    # max_bucket=None: exact pigeonhole semantics to match the
    # brute-force oracle at any sf (see q_minhash_lsh).
    pairs = simhash_pairs(docs, max_hamming=3, hash_fn=md5_prefix60,
                          max_bucket=None)
    return pairs.select("d1", "d2", F.col("hamming").cast("int").alias("hamming"))


def _winnow_oracle(k: int = 12, w: int = 6, max_df: int = 20,
                   min_shared: int = 8) -> str:
    """Winnowing SQL twin: character k-gram rolling hashes
    (md5-bridge), per-position window minima via a frame window
    function, distinct fingerprints, the same stop-fingerprint df cap,
    and the pair self-join with the shared-count floor."""
    h = MD5_PREFIX60_SQL.format(f"substr(t, CAST(i AS INT), {k})")
    return f"""
    WITH pos AS (
        SELECT doc_id, lower(text) AS t,
               len(lower(text)) - {k - 1} AS ng
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i, {h} AS h
        FROM pos, unnest(generate_series(1, ng)) AS u(i)
    ),
    wmins AS (
        SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                   AS m,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    fps AS (SELECT DISTINCT doc_id, m AS fp FROM wmins WHERE i <= n - {w - 1}),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}),
    fpr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp)
    SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS shared
    FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
    """


@query("q_winnow_overlap", oracle=_winnow_oracle())
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash, windowed minima — the
    MOSS/Schleimer-Wilkerson-Aiken scheme) substring-overlap pairs:
    detects shared passages rather than whole-doc near-dups. The
    stop-fingerprint df-cap (<= 20 docs) drops boilerplate
    fingerprints BEFORE the self-join — a fingerprint in m docs costs
    m^2/2 candidate pairs, exactly the join skew that must be capped
    at 100 TB; min_shared = 8 keeps only pairs sharing a real passage
    (guarantee: any shared substring of >= w + k - 1 = 17 chars
    contributes >= 1 shared fingerprint).

    Declared with the md5-bridge hash so the oracle recomputes the
    identical winnowed minima; production callers keep the xxhash64
    default (operators/winnowing.py)."""
    from ..operators.winnowing import fingerprint_overlap_pairs

    docs = tables.load_table(spark, sf_dir, "documents")
    return fingerprint_overlap_pairs(
        docs, min_shared=8, max_df=20, hash_fn=md5_prefix60
    )


def _fp_index_probe_oracle(max_hamming: int = 3) -> str:
    """Index-probe SQL twin: the same md5-bridge fingerprint CTE as
    the SimHash oracle, restricted to even-id (indexed) vs odd-id
    (probe) cross pairs — brute force over what the engine answers
    from the persistent chunk-blocked index, so a hash match proves
    the INDEX path (manifest radius, chunk blocking, in-row verify)
    loses nothing vs recomputation."""
    return f"""
    {_simhash_fp_cte()}
    SELECT b.doc_id AS new_id, a.doc_id AS idx_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@query("q_fp_index_probe", oracle=_fp_index_probe_oracle())
def q_fp_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup serving from the PERSISTENT fingerprint
    index (operators/fp_index.py): even-id documents' SimHash
    fingerprints are indexed once per process (fp_index_for scratch
    cache, the q_ivf_topk amortization), odd-id documents probe it —
    the '1M new uploads vs the indexed corpus' shape, driver-attested.
    Built with the md5-bridge hash so the DuckDB oracle recomputes
    identical fingerprints and brute-forces the even-vs-odd pairs; a
    hash match therefore covers the index's manifest-pinned chunk
    blocking and in-row bit_count verify, not just the fingerprint
    math. DECLARED since r8 (the r7 tier earns its driver
    attestation; slot from the q_scalar_subquery/q_blocklist_filter
    cession)."""
    from ..operators.fp_index import (
        dedup_fingerprints_against_index,
        fp_index_for,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    fps = simhash64(docs, hash_fn=md5_prefix60)
    idx_path = fp_index_for(
        fps.where(F.col("doc_id") % 2 == 0),
        cache_key=("fp_probe", sf_dir), max_hamming=3,
        id_col="doc_id", fp_col="simhash",
    )
    pairs = dedup_fingerprints_against_index(
        fps.where(F.col("doc_id") % 2 == 1), idx_path, id_col="doc_id"
    )
    return pairs.select(
        "new_id", "idx_id", F.col("hamming").cast("int").alias("hamming")
    )


# the at-rest artifacts q_media_replay writes and its DuckDB oracle
# reads back — the q_trained_cells static-SQL-vs-runtime-artifact
# trick on a PER-PROCESS path (the driver evaluates the oracle string
# in the same process that ran the query; concurrent sessions get
# disjoint directories).
_MEDIA_REPLAY_ROOT = None


def _media_replay_root() -> str:
    global _MEDIA_REPLAY_ROOT
    if _MEDIA_REPLAY_ROOT is None:
        import os
        import tempfile

        _MEDIA_REPLAY_ROOT = os.path.join(
            tempfile.gettempdir(), f"w3frs_media_replay_{os.getpid()}"
        )
    return _MEDIA_REPLAY_ROOT


def _media_replay_oracle() -> str:
    root = _media_replay_root()
    return f"""
    SELECT b.media_id,
           CASE WHEN p.id IS NOT NULL THEN 'corpus_dup'
                ELSE 'admitted' END AS verdict
    FROM read_parquet('{root}/batch2_ids/*.parquet') b
    LEFT JOIN read_parquet('{root}/pre_replay_ids/*.parquet') p
           ON b.media_id = p.id
    """


def _media_replay_images():
    """Deterministic synthetic PNG corpus: a flat template trio
    (identical bytes — one hot fingerprint bucket, quarantined at
    cap 2) plus structured sine-pattern singletons with pairwise
    distant dHashes (the r10 media-scale lesson: flat/gradient
    synthetic images collapse dHash; rich structure spreads it)."""
    import numpy as np

    from ..multimodal.media import _png_encode

    def pattern(seed: int) -> bytes:
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float64)
        img = 128 + 44 * np.sin((0.07 + 0.04 * seed) * xx + 0.7 * seed) \
            + 44 * np.sin((0.11 + 0.03 * seed) * yy + 1.3 * seed)
        gray = np.clip(img, 40, 215).astype(np.uint8)
        return _png_encode(np.repeat(gray[..., None], 3, axis=2))

    flat = _png_encode(np.full((24, 32, 3), 128, np.uint8))
    batch1 = [(i, "image", flat, None) for i in (1, 2, 3)]
    batch1 += [(i, "image", pattern(i), None) for i in (4, 5, 6)]
    fresh = [(i, "image", pattern(i), None) for i in (7, 8)]
    return batch1, fresh


@query("q_media_replay", oracle=_media_replay_oracle())
def q_media_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media ingest loop's replay contract as a hash-checkable
    oracle (VERDICT r10 next-round #4): ingest a fixed synthetic image
    batch into a fresh persistent fingerprint index
    (pipelines/media_curation.py:ingest_media_batch), snapshot the
    persisted index ids, then ingest a REPLAY of the same batch plus
    fresh images and return every batch-2 row's routing verdict. The
    DuckDB oracle recomputes the verdicts from the PERSISTED pre-replay
    index state alone: corpus_dup iff the media_id is already indexed
    — the corpus-dup-by-IDENTITY contract the r10 1e5-image run caught
    being violated for quarantined buckets (the flat trio here sits in
    a bucket past cap 2, so the Hamming probe is blind by design and
    only identity can reject the replay; pre-fix engines re-admit it
    and hash-mismatch). Fresh ids 7-8 keep the 'admitted' branch
    non-vacuous. Fixed content, sf-independent, per-process artifact
    root rebuilt on every invocation. DECLARED since r11 (the r11
    rotation: took q_string_funcs' slot — the media ingest loop was
    the strongest pytest-only contract the window lacked)."""
    import shutil

    from ..pipelines.media_curation import (
        MediaCurationConfig,
        ingest_media_batch,
    )

    root = _media_replay_root()
    shutil.rmtree(root, ignore_errors=True)
    idx = f"{root}/index"

    from ..multimodal.media import MEDIA_SCHEMA

    batch1_rows, fresh_rows = _media_replay_images()
    cfg = MediaCurationConfig(modalities=("image",), max_bucket=2)

    batch1 = local_df(spark, batch1_rows, MEDIA_SCHEMA)
    ingest_media_batch(batch1, idx, cfg)

    # snapshot the persisted index state batch 2 is judged against
    pre = spark.read.parquet(f"{idx}/image/chunks").select("id").distinct()
    pre.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/pre_replay_ids"
    )

    batch2 = local_df(spark, batch1_rows + fresh_rows, MEDIA_SCHEMA)
    batch2.select("media_id").coalesce(1).write.mode("overwrite").parquet(
        f"{root}/batch2_ids"
    )
    rejects, admitted = ingest_media_batch(batch2, idx, cfg)
    return (
        rejects.select(
            "media_id", F.col("reject_reason").alias("verdict")
        )
        .unionByName(
            admitted.select(
                "media_id", F.lit("admitted").alias("verdict")
            )
        )
        .select(F.col("media_id").cast("long").alias("media_id"),
                "verdict")
    )


@query(
    "q_paragraph_dedup",
    declared=False,
    oracle="""
    WITH paras AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS idx, arr[i] AS para
        FROM (SELECT doc_id, string_split(text, '. ') AS arr
              FROM documents WHERE text IS NOT NULL),
             unnest(generate_series(1, len(arr))) AS t(i)
    ),
    keyed AS (
        SELECT doc_id, idx, para, md5(para) AS k,
               length(para) >= 20 AS eligible
        FROM paras
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY k ORDER BY doc_id, idx) AS rn
        FROM keyed WHERE eligible
    ),
    kept AS (
        SELECT doc_id, idx, para FROM ranked WHERE rn = 1
        UNION ALL
        SELECT doc_id, idx, para FROM keyed WHERE NOT eligible
    ),
    dropped AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dropped
        FROM ranked WHERE rn > 1 GROUP BY doc_id
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(para, '. ' ORDER BY idx) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.text, '') AS text,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(dr.n_dropped, 0) AS n_dropped
    FROM documents d
    LEFT JOIN rebuilt r USING (doc_id)
    LEFT JOIN dropped dr USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-style paragraph-level exact dedup
    (operators/paradedup.py): corpus-wide keep-first over md5 paragraph
    identity, short paragraphs exempt, documents reassembled in
    original order with per-doc kept/dropped accounting. The oracle
    replays split, hash, the row_number keep-first cut and the ordered
    string_agg rebuild. Fixture caveat (documented, the PII-query
    precedent): the synthetic corpus has no '. ' separators, so every
    document is ONE paragraph and the non-trivial rows are the
    injected exact-dup documents (their single paragraph drops,
    emptying the later copy — visible loss accounting, not a silent
    drop); the multi-paragraph semantics are pinned on constructed
    corpora in tests/test_paradedup.py."""
    from ..operators.paradedup import dedup_paragraphs

    docs = tables.load_table(spark, sf_dir, "documents")
    return dedup_paragraphs(
        docs, sep=". ", min_chars=20
    ).orderBy("doc_id")


@query(
    "q_containment",
    declared=False,
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle
                           AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT d1, d2, i, s1.n AS n1, s2.n AS n2
        FROM inter
        JOIN sz s1 ON d1 = s1.doc_id
        JOIN sz s2 ON d2 = s2.doc_id
    ),
    directed AS (
        SELECT d1 AS src, d2 AS dst, i * 1.0 / n1 AS c
        FROM sized WHERE i * 1.0 / n1 >= 0.8
        UNION ALL
        SELECT d2, d1, i * 1.0 / n2
        FROM sized WHERE i * 1.0 / n2 >= 0.8
    )
    SELECT src, dst,
           floor(c * 10000 + 0.5) / 10000 AS containment
    FROM directed ORDER BY src, dst
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed exact 3-gram containment >= 0.8
    (operators/dedup.py:ngram_containment_pairs): the short-inside-
    long duplication Jaccard structurally misses — C(src -> dst) =
    |S_src ∩ S_dst| / |S_src|, both passing directions emitted. The
    oracle recomputes the shingle sets, the pair intersection and
    both directed ratios in DuckDB; on this corpus the rows are the
    injected exact/near copies (both directions ~1.0) — the
    asymmetric short-in-long case is pinned on constructed corpora
    in tests/test_dedup.py."""
    from ..operators.dedup import ngram_containment_pairs

    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = ngram_containment_pairs(docs, threshold=0.8)
    return pairs.select(
        "src", "dst", round4(pairs.containment).alias("containment")
    ).orderBy("src", "dst")


def _containment_blocked_oracle(threshold: float = 0.8, k: int = 12,
                                w: int = 6, min_shared: int = 2,
                                max_df: int = 50) -> str:
    """SQL twin of the COMPOSED blocked containment path: the
    q_winnow_overlap oracle's propose stage (rolling k-gram md5
    minima, df cap, shared-count floor) feeding the q_containment
    oracle's exact directed confirm, restricted to the proposed
    candidate set — so a hash match checks the composition itself,
    not just its two halves."""
    h = MD5_PREFIX60_SQL.format(f"substr(t, CAST(i AS INT), {k})")
    return f"""
    WITH pos AS (
        SELECT doc_id, lower(text) AS t,
               len(lower(text)) - {k - 1} AS ng
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i, {h} AS h
        FROM pos, unnest(generate_series(1, ng)) AS u(i)
    ),
    wmins AS (
        SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                   AS m,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    fps AS (SELECT DISTINCT doc_id, m AS fp FROM wmins
            WHERE i <= n - {w - 1}),
    rare AS (SELECT fp FROM fps GROUP BY fp
             HAVING count(*) <= {max_df}),
    fpr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp),
    cand AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    ),
    tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.d1, c.d2, count(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.d1
        JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT i.d1, i.d2, i.i, s1.n AS n1, s2.n AS n2
        FROM inter i
        JOIN sz s1 ON i.d1 = s1.doc_id
        JOIN sz s2 ON i.d2 = s2.doc_id
    ),
    directed AS (
        SELECT d1 AS src, d2 AS dst, i * 1.0 / n1 AS c
        FROM sized WHERE i * 1.0 / n1 >= {threshold}
        UNION ALL
        SELECT d2, d1, i * 1.0 / n2
        FROM sized WHERE i * 1.0 / n2 >= {threshold}
    )
    SELECT src, dst,
           floor(c * 10000 + 0.5) / 10000 AS containment
    FROM directed ORDER BY src, dst
    """


def _cont_index_probe_oracle(threshold: float = 0.8, k: int = 12,
                             w: int = 6, min_shared: int = 2,
                             max_df: int = 50) -> str:
    """SQL twin of the PERSISTENT containment index probe: the blocked
    composition split even (indexed) vs odd (probe) — winnow fps per
    side, stop-fp cap computed over the INDEX population only (the
    manifest contract), cross-side candidates clearing min_shared,
    exact directed confirm. A hash match attests the index's
    manifest-pinned propose/confirm path end to end."""
    h = MD5_PREFIX60_SQL.format(f"substr(t, CAST(i AS INT), {k})")
    return f"""
    WITH pos AS (
        SELECT doc_id, lower(text) AS t,
               len(lower(text)) - {k - 1} AS ng
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i, {h} AS h
        FROM pos, unnest(generate_series(1, ng)) AS u(i)
    ),
    wmins AS (
        SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                   AS m,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    fps AS (SELECT DISTINCT doc_id, m AS fp FROM wmins
            WHERE i <= n - {w - 1}),
    idx_fps AS (SELECT * FROM fps WHERE doc_id % 2 = 0),
    probe_fps AS (SELECT * FROM fps WHERE doc_id % 2 = 1),
    hot AS (SELECT fp FROM idx_fps GROUP BY fp
            HAVING count(*) > {max_df}),
    probe_ok AS (
        SELECT p.doc_id, p.fp FROM probe_fps p
        LEFT JOIN hot ho ON p.fp = ho.fp WHERE ho.fp IS NULL
    ),
    cand AS (
        SELECT p.doc_id AS new_id, x.doc_id AS idx_id
        FROM probe_ok p JOIN idx_fps x ON p.fp = x.fp
        GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    ),
    tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.new_id, c.idx_id, count(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.new_id
        JOIN sh b ON b.doc_id = c.idx_id AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT i.new_id, i.idx_id, i.i, sn.n AS n_new, si.n AS n_idx
        FROM inter i
        JOIN sz sn ON i.new_id = sn.doc_id
        JOIN sz si ON i.idx_id = si.doc_id
    ),
    directed AS (
        SELECT new_id AS src, idx_id AS dst, i * 1.0 / n_new AS c
        FROM sized WHERE i * 1.0 / n_new >= {threshold}
        UNION ALL
        SELECT idx_id, new_id, i * 1.0 / n_idx
        FROM sized WHERE i * 1.0 / n_idx >= {threshold}
    )
    SELECT src, dst,
           floor(c * 10000 + 0.5) / 10000 AS containment
    FROM directed ORDER BY src, dst
    """


@query("q_cont_index_probe", declared=False,
       oracle=_cont_index_probe_oracle())
def q_cont_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-extract serving from the PERSISTENT containment index
    (operators/cont_index.py, new r14 — closing the batch+index+stream
    pattern for the containment family): even-id documents are indexed
    once per process (cont_index_for scratch cache, the
    q_fp_index_probe amortization), odd-id documents probe it. Built
    with the md5-bridge hash so the DuckDB oracle replays identical
    rolling-hash minima; the oracle reruns the index's whole
    propose/confirm path — index-side stop-fp cap, cross-side
    min_shared candidates, exact directed confirm against the stored
    shingle sets — so a hash match attests the manifest-pinned probe
    end to end. Undeclared (oracle-parity-run in
    tests/test_oracle_parity.py); a future rotation candidate."""
    from ..operators.cont_index import (
        cont_index_for,
        containment_against_index,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    idx_path = cont_index_for(
        docs.where(F.col("doc_id") % 2 == 0),
        cache_key=("cont_probe", sf_dir), hash="md5_prefix60",
    )
    pairs = containment_against_index(
        docs.where(F.col("doc_id") % 2 == 1), idx_path, 0.8
    )
    return pairs.select(
        "src", "dst", round4(F.col("containment")).alias("containment")
    ).orderBy("src", "dst")


@query("q_containment_blocked",
       oracle=_containment_blocked_oracle())
def q_containment_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB containment path
    (operators/winnowing.py:containment_pairs_blocked — r13, making
    the r12 scale disposition real): winnowing fingerprints PROPOSE
    candidate pairs (df-capped equi-join, the only corpus-wide
    stage), the exact directed shingle ratio CONFIRMS on the
    candidate set via an in-row array_intersect. Declared with the
    md5-bridge hash so the oracle replays the identical rolling-hash
    minima; the oracle then reruns the whole composition — propose,
    cap, floor, confirm, both directed ratios — in DuckDB, so a hash
    match attests the composition's recall surface on this corpus,
    not just its halves. Planted short-in-long recall/precision vs
    the brute-force tier is pinned in
    tests/test_winnowing_containment.py. Declared in r14 (took
    q_transitions' slot — r13 VERDICT #2)."""
    from ..operators.winnowing import containment_pairs_blocked

    docs = tables.load_table(spark, sf_dir, "documents")
    pairs = containment_pairs_blocked(
        docs, threshold=0.8, hash_fn=md5_prefix60
    )
    return pairs.select(
        "src", "dst", round4(pairs.containment).alias("containment")
    ).orderBy("src", "dst")


@query(
    "q_substring_dedup",
    declared=True,  # r12 rotation: took q_chunk's slot
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS ts
        FROM documents WHERE text IS NOT NULL
    ),
    win AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               md5(array_to_string(ts[i:i+19], ' ')) AS h
        FROM tok, unnest(generate_series(1, len(ts) - 19)) AS t(i)
        WHERE len(ts) >= 20
    ),
    ranked AS (
        SELECT doc_id, pos,
               row_number() OVER (
                   PARTITION BY h ORDER BY doc_id, pos) AS rn,
               count(*) OVER (PARTITION BY h) AS c
        FROM win
    ),
    cov AS (
        SELECT doc_id, CAST(pos + j AS INT) AS tp, rn = 1 AS is_keeper
        FROM ranked, unnest(generate_series(0, 19)) AS g(j)
        WHERE c >= 2
    ),
    removedpos AS (
        SELECT doc_id, tp FROM cov
        GROUP BY doc_id, tp HAVING NOT bool_or(is_keeper)
    ),
    toks AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS tp, ts[i] AS tok
        FROM tok, unnest(generate_series(1, len(ts))) AS t(i)
    ),
    keptt AS (
        SELECT t.doc_id, t.tp, t.tok FROM toks t
        ANTI JOIN removedpos r USING (doc_id, tp)
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM keptt GROUP BY doc_id
    ),
    ndrop AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dropped
        FROM removedpos GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.text, '') AS text,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(n.n_dropped, 0) AS n_dropped
    FROM documents d
    LEFT JOIN rebuilt r USING (doc_id)
    LEFT JOIN ndrop n USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup with removal semantics
    (operators/substrdedup.py — the Lee et al. 2022 ExactSubstr
    tier): remove every later occurrence of a duplicated >=20-token
    span (k=20 because the fixture documents run 10-99 tokens; the
    operator default is the paper's 50), keep-first by (doc_id, pos),
    keeper coverage protecting exactly one surviving copy, documents
    reassembled from surviving tokens with per-doc token-level
    kept/dropped accounting. The oracle replays the literal-space
    tokenization, every k-window md5, the row_number keep-first cut,
    generate_series position coverage, the bool_or keeper-protection
    rule and the ordered string_agg rebuild. On this corpus the
    non-trivial rows are the injected exact/near-dup documents (whole
    or partial span removal from the later copy); multi-span,
    straddling-boundary and self-overlap semantics are pinned on
    constructed corpora in tests/test_substrdedup.py."""
    from ..operators.substrdedup import dedup_substrings

    docs = tables.load_table(spark, sf_dir, "documents")
    return dedup_substrings(docs, k=20).orderBy("doc_id")


_SPAN_INGEST_ROOT = None


def _span_ingest_root() -> str:
    """Per-process scratch root for the at-rest state the oracle
    reads back. $SPARK_GRAFT_SPAN_INGEST_DIR overrides the
    pid-derived default so the oracle SQL can be replayed standalone
    or from another process against a previous run's state (r12
    ADVICE; without the override, running the oracle before fn() in
    the same process fails on the missing b1_admitted parquet — the
    q_media_replay convention: fn() populates, oracle reads)."""
    global _SPAN_INGEST_ROOT
    if _SPAN_INGEST_ROOT is None:
        import os
        import tempfile

        _SPAN_INGEST_ROOT = os.environ.get(
            "SPARK_GRAFT_SPAN_INGEST_DIR"
        ) or os.path.join(
            tempfile.gettempdir(), f"w3frs_span_ingest_{os.getpid()}"
        )
    return _SPAN_INGEST_ROOT


def _span_ingest_oracle() -> str:
    """Batch-2 ingest verdicts recomputed from the AT-REST state:
    batch 1's admitted (cleaned) text persisted by the Spark side is
    the trusted history (the q_media_replay / q_trained_cells at-rest
    convention); everything about batch 2 — windows, the
    history-hit rule (no keeper), the batch-local keep-first rule,
    keeper protection, position coverage, the rebuild and the
    emptied-doc verdict — is recomputed in DuckDB from raw text, on
    window TEXT equality (the collision-free ground truth the
    engine's xxhash64 tier approximates)."""
    root = _span_ingest_root()
    return f"""
    WITH b1 AS (
        SELECT text FROM read_parquet('{root}/b1_admitted/*.parquet')
    ),
    b2 AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 2 = 1 AND text IS NOT NULL
    ),
    hist AS (
        SELECT DISTINCT array_to_string(ts[i:i+19], ' ') AS w
        FROM (SELECT string_split(text, ' ') AS ts FROM b1),
             unnest(generate_series(1, len(ts) - 19)) AS t(i)
        WHERE len(ts) >= 20
    ),
    occ AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               array_to_string(ts[i:i+19], ' ') AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM b2),
             unnest(generate_series(1, len(ts) - 19)) AS t(i)
        WHERE len(ts) >= 20
    ),
    hit AS (
        SELECT o.doc_id, o.pos FROM occ o JOIN hist h ON o.w = h.w
    ),
    miss AS (
        SELECT o.doc_id, o.pos, o.w FROM occ o
        ANTI JOIN hit USING (doc_id, pos)
    ),
    ranked AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY w ORDER BY doc_id, pos)
                   AS rn,
               count(*) OVER (PARTITION BY w) AS c
        FROM miss
    ),
    dup AS (
        SELECT doc_id, pos, FALSE AS is_keeper FROM hit
        UNION ALL
        SELECT doc_id, pos, rn = 1 FROM ranked WHERE c >= 2
    ),
    cov AS (
        SELECT doc_id, CAST(pos + j AS INT) AS tp, is_keeper
        FROM dup, unnest(generate_series(0, 19)) AS g(j)
    ),
    removedpos AS (
        SELECT doc_id, tp FROM cov
        GROUP BY doc_id, tp HAVING NOT bool_or(is_keeper)
    ),
    toks AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS tp, ts[i] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM b2),
             unnest(generate_series(1, len(ts))) AS t(i)
    ),
    keptt AS (
        SELECT t.doc_id, t.tp, t.tok FROM toks t
        ANTI JOIN removedpos r USING (doc_id, tp)
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM keptt GROUP BY doc_id
    ),
    outp AS (
        SELECT d.doc_id,
               coalesce(r.text, '') AS text,
               coalesce(r.n_kept, 0) AS n_kept
        FROM b2 d LEFT JOIN rebuilt r USING (doc_id)
    )
    SELECT doc_id,
           CASE WHEN n_kept = 0 THEN 'all_spans_duplicated'
                ELSE 'admitted' END AS verdict,
           CASE WHEN n_kept = 0 THEN '' ELSE text END AS text,
           n_kept
    FROM outp ORDER BY doc_id
    """


@query("q_span_ingest", declared=True, oracle=None)  # r12: took q_blocks_scan's slot; oracle attached below
def q_span_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent span index ingest replay (operators/span_index.py):
    even-id documents are ingested into a fresh index (batch 1, an
    empty-index pass equal to the one-shot operator) and their
    ADMITTED cleaned text persisted at rest; odd-id documents then
    ingest as batch 2, and the oracle recomputes every batch-2
    verdict, rewritten text and kept-token count in DuckDB from the
    persisted batch-1 text + raw batch-2 text alone — the history-hit
    no-keeper rule, batch-local keep-first, coverage, rebuild and the
    emptied-doc rejection, on window-TEXT equality (ground truth for
    the engine's xxhash64 tier). k=20, the q_substring_dedup fixture
    convention. The oracle is attached after registration (it embeds
    the per-process at-rest path, the q_media_replay pattern)."""
    import os
    import shutil

    from ..operators.span_index import (
        ingest_spans_batch,
        init_span_index,
    )

    root = _span_ingest_root()
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    docs = tables.load_table(spark, sf_dir, "documents")
    b1 = docs.where((F.col("doc_id") % 2 == 0)
                    & F.col("text").isNotNull()).select("doc_id", "text")
    b2 = docs.where((F.col("doc_id") % 2 == 1)
                    & F.col("text").isNotNull()).select("doc_id", "text")

    idx = os.path.join(root, "idx")
    init_span_index(b1, idx, k=20)
    _rej1, adm1 = ingest_spans_batch(b1, idx)
    adm1.select("text").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "b1_admitted")
    )
    rej2, adm2 = ingest_spans_batch(b2, idx)
    return (
        adm2.select(
            "doc_id", F.lit("admitted").alias("verdict"), "text",
            "n_kept",
        )
        .unionByName(
            rej2.select(
                "doc_id", F.col("reject_reason").alias("verdict"),
                F.lit("").alias("text"),
                F.lit(0).cast("long").alias("n_kept"),
            )
        )
        .orderBy("doc_id")
    )


def _set_span_ingest_oracle() -> None:
    from ..registry import REGISTRY, Query

    q = REGISTRY["q_span_ingest"]
    REGISTRY["q_span_ingest"] = Query(
        q.name, q.fn, _span_ingest_oracle(), q.doc, q.declared
    )


_set_span_ingest_oracle()
