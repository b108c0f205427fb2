"""Sampling / dataset-splitting queries over documents (north-star
C10-C13 companion ops a training-data pipeline needs).

All three use a DETERMINISTIC hash bucket instead of RNG sampling so
the DuckDB oracle can replay them exactly: both engines lowercase-hex
md5 the stringified doc_id and map the last hex digit to 0..15 via
instr('0123456789abcdef', ...). This is also the production-correct
shape at 100 TB — hash-of-key splits are reproducible across runs,
stable under repartitioning, and need no shuffle or state (contrast
``df.sample``/``sampleBy``, whose per-partition RNG draws are neither
portable across engines nor stable across partition counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..registry import query
from ..sources import tables

# 0..15 from the last hex digit of md5(doc_id) — portable across
# Spark/DuckDB (both emit lowercase hex; instr is 1-based in both).
_BUCKET_SQL = (
    "instr('0123456789abcdef', substr(md5(cast(doc_id AS VARCHAR)), 32, 1)) - 1"
)
_BUCKET_SPARK = (
    "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 32, 1)) - 1"
)

# Per-language keep thresholds (buckets < rate survive): downsample the
# dominant language hard, keep the tail intact — the usual rebalancing
# move before training.
_RATES = {"en": 4, "de": 8, "fr": 8, "es": 8, "zh": 16}
_DEFAULT_RATE = 16


@query(
    "q_train_split",
    oracle=f"""
    WITH b AS (
        SELECT *, {_BUCKET_SQL} AS bucket FROM documents
    )
    SELECT CASE WHEN bucket < 12 THEN 'train'
                WHEN bucket < 14 THEN 'val'
                ELSE 'test' END                        AS split,
           CAST(count(*) AS BIGINT)                    AS n_docs,
           CAST(sum(n_chars) AS BIGINT)                AS total_chars,
           floor(avg(n_chars) * 10000 + 0.5) / 10000   AS avg_chars
    FROM b
    GROUP BY 1
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12/2/2 train/val/test split by content-key hash,
    with per-split volume stats. One scan, one partial-aggregated
    shuffle; the split column is a pure codegen expression."""
    docs = tables.load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket < 12, "train").when(bucket < 14, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            round4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


@query(
    "q_sample_stratified",
    oracle=f"""
    WITH b AS (
        SELECT lang, {_BUCKET_SQL} AS bucket FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                          AS n_total,
           CAST(count(*) FILTER (bucket <
               CASE lang WHEN 'en' THEN {_RATES["en"]}
                         WHEN 'de' THEN {_RATES["de"]}
                         WHEN 'fr' THEN {_RATES["fr"]}
                         WHEN 'es' THEN {_RATES["es"]}
                         WHEN 'zh' THEN {_RATES["zh"]}
                         ELSE {_DEFAULT_RATE} END) AS BIGINT) AS n_kept,
           floor((CAST(count(*) FILTER (bucket <
               CASE lang WHEN 'en' THEN {_RATES["en"]}
                         WHEN 'de' THEN {_RATES["de"]}
                         WHEN 'fr' THEN {_RATES["fr"]}
                         WHEN 'es' THEN {_RATES["es"]}
                         WHEN 'zh' THEN {_RATES["zh"]}
                         ELSE {_DEFAULT_RATE} END) AS DOUBLE)
                  / count(*)) * 10000 + 0.5) / 10000          AS kept_frac
    FROM b
    GROUP BY lang
    """,
    declared=False,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language keep rates (the
    deterministic twin of ``df.sampleBy``): dominant-language docs keep
    4/16 hash buckets, mid languages 8/16, tail languages all. Output
    audits the realized per-stratum fractions.

    Undeclared since r9: ceded its slot to q_pack in the rotation
    toward pretraining assembly (C19 stays driver-attested via
    q_train_split + q_mixture + q_pack + q_chunk); still
    oracle-checked by tests/test_oracle_parity.py's whole-registry
    parametrize."""
    docs = tables.load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    rate = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in _RATES.items() for x in kv]
        )[F.col("lang")],
        F.lit(_DEFAULT_RATE),
    )
    kept = F.sum(F.when(F.col("bucket") < F.col("rate"), 1).otherwise(0))
    return (
        docs.select("lang", bucket.alias("bucket"), rate.alias("rate"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            kept.cast("long").alias("n_kept"),
            round4(kept.cast("double") / F.count("*")).alias("kept_frac"),
        )
    )


@query(
    "q_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) AS BIGINT) * 100 AS bucket_lo,
           CAST(count(*) AS BIGINT)                   AS n_docs,
           CAST(min(n_chars) AS BIGINT)               AS min_chars,
           CAST(max(n_chars) AS BIGINT)               AS max_chars
    FROM documents
    GROUP BY 1
    """,
    declared=False,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets) — the standard
    first look at a corpus before setting length filters. Fixed-width
    bucketing is a scalar expression, so the plan is scan -> partial
    agg -> single exchange regardless of corpus size.

    Undeclared since round 3: its driver slot went to q_bm25 (C13
    relevance scoring); C19 stays driver-attested through
    q_train_split and q_sample_stratified, and this query remains
    pytest-parity-run."""
    docs = tables.load_table(spark, sf_dir, "documents")
    bucket_lo = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return (
        docs.select(bucket_lo.alias("bucket_lo"), "n_chars")
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "q_pack",
    oracle=None,  # set immediately below (needs the operator's helper)
)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining (concatenate-and-cut at a
    512-token budget): each document's (start_bin, start_offset) in
    the packed stream via a two-phase distributed prefix sum — no
    single-partition global window (operators/packing.py). DECLARED
    since r9 (the r9 window rotation toward pretraining assembly:
    took q_sample_stratified's slot; previously undeclared
    parity-run + fuzzed since r4) — the oracle is the single-window
    DuckDB prefix sum, so the hash gate covers the distributed
    two-phase arithmetic end to end."""
    from ..operators.packing import pack_sequences

    docs = tables.load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512)


def _set_pack_oracle() -> None:
    from ..operators.packing import pack_oracle_sql
    from ..registry import REGISTRY, Query

    q = REGISTRY["q_pack"]
    REGISTRY["q_pack"] = Query(
        q.name, q.fn, pack_oracle_sql(512), q.doc, q.declared
    )


_set_pack_oracle()


@query(
    "q_chunk",
    oracle=None,  # set immediately below (needs the operator's helper)
    declared=False,
)
def q_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token document chunking (128-token windows,
    16-token overlap): the long-document complement of q_pack's
    concatenate-and-cut (operators/chunking.py). Undeclared since r12
    (ceded its slot to q_substring_dedup in the rotation — C19 stays
    driver-attested by q_pack's conservation arithmetic and the
    chunk_token_ids pinning): still oracle-parity-run in
    tests/test_oracle_parity.py and fuzzed on generated corpora in
    tests/test_oracle_fuzz.py. Declared r9-r11 (took q_percentile's
    slot in the r9 pretraining-assembly rotation)."""
    from ..operators.chunking import chunk_documents

    docs = tables.load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=128, overlap=16)


def _set_chunk_oracle() -> None:
    from ..operators.chunking import chunk_oracle_sql
    from ..registry import REGISTRY, Query

    q = REGISTRY["q_chunk"]
    REGISTRY["q_chunk"] = Query(
        q.name, q.fn, chunk_oracle_sql(128, 16), q.doc, q.declared
    )


_set_chunk_oracle()


def _mixture_oracle() -> str:
    from ..operators.mixture import uniform_sql

    u_long = uniform_sql("doc_id", "long", 7)
    u_short = uniform_sql("doc_id", "short", 7)
    return f"""
    WITH longd AS (SELECT doc_id FROM documents WHERE n_chars >= 300),
         shortd AS (SELECT doc_id FROM documents WHERE n_chars < 300)
    SELECT doc_id, 'long' AS source, CAST(0 AS INT) AS epoch FROM longd
    UNION ALL
    SELECT doc_id, 'long', CAST(1 AS INT) FROM longd
    UNION ALL
    SELECT doc_id, 'long', CAST(2 AS INT) FROM longd WHERE {u_long} < 0.5
    UNION ALL
    SELECT doc_id, 'short', CAST(0 AS INT) FROM shortd WHERE {u_short} < 0.4
    """


@query("q_mixture", oracle=_mixture_oracle())
def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture of two sub-corpora (long docs at
    rate 2.5 = two full epochs + a hash-sampled half; short docs at
    0.4): the data-mixture step of a pretraining pipeline
    (operators/mixture.py). Declared in r6 (rotated in — the
    pretraining recipe); the DuckDB twin derives the identical keep
    set from the md5-bridge uniform, so composition is
    engine-reproducible."""
    from ..operators.mixture import mixture_sample

    docs = tables.load_table(spark, sf_dir, "documents")
    longd = docs.where(F.col("n_chars") >= 300).select("doc_id")
    shortd = docs.where(F.col("n_chars") < 300).select("doc_id")
    return mixture_sample(
        [("long", longd), ("short", shortd)],
        {"long": 2.5, "short": 0.4},
        seed=7,
    )


def _normalize_oracle() -> str:
    from ..operators.normalize import normalize_sql

    n = normalize_sql("text")
    return f"""
    SELECT doc_id, {n} AS text,
           ({n} IS DISTINCT FROM text) AS was_dirty
    FROM documents
    """


@query("q_normalize", oracle=_normalize_oracle(), declared=False)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization text normalization (control-char strip,
    whitespace-run collapse, trim) with a per-row was_dirty flag
    (operators/normalize.py). Undeclared (the driver window is full);
    the fixture corpus is clean, so the operative verification is the
    dirty-corpus fuzz in tests/test_oracle_fuzz.py — this entry pins
    the clean-passthrough case cross-engine."""
    from ..operators.normalize import normalize_documents

    docs = tables.load_table(spark, sf_dir, "documents")
    return normalize_documents(docs.select("doc_id", "text"))
