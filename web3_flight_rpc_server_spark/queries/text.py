"""Text-analysis queries over the documents table (north-star C13).

Language ID, quality scoring, token counting, and fingerprinting for a
training-data pipeline — all pure built-in expressions (codegen), with
exact DuckDB oracle twins. The heuristics are honest (stopword ratios,
regex token classes, md5 content fingerprints); on the synthetic corpus
the lang label is not recoverable from the text, so q_lang_id's parity
checks the computation, not classifier accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..functions.text import STOPWORDS, stopword_hits, stopword_hits_sql, tokens
from ..registry import query
from ..sources import tables

_BPE_ISH = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@query(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                      AS n_chars_calc,
           CAST(len(string_split(text, ' ')) AS BIGINT)      AS n_tokens,
           floor((CAST(length(text) AS DOUBLE)
                  / len(string_split(text, ' '))) * 10000 + 0.5) / 10000
                                                             AS chars_per_token,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
                                                             AS n_spaces
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics (length, token count, density)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        round4(n_chars.cast("double") / n_tokens).alias("chars_per_token"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        ).cast("long").alias("n_spaces"),
    )


@query(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_ISH}')) AS BIGINT)
                                                        AS bpe_ish_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex class
    (letter runs / digit runs / single punctuation)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_ISH))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def _langid_oracle() -> str:
    toks = "string_split(lower(text), ' ')"
    hits = {lang: stopword_hits_sql(toks, lang) for lang in STOPWORDS}
    # argmax with deterministic preference order en > de > fr > es;
    # 'unknown' when no stopword hits at all.
    return f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_label,
               {hits['en']} AS h_en, {hits['de']} AS h_de,
               {hits['fr']} AS h_fr, {hits['es']} AS h_es,
               len({toks}) AS n_tok
        FROM documents
    )
    SELECT doc_id, lang_label,
           CASE
             WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
             WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
             WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
             WHEN h_fr >= h_es THEN 'fr'
             ELSE 'es'
           END AS lang_pred,
           floor((CAST(greatest(h_en, h_de, h_fr, h_es) AS DOUBLE) / n_tok)
                 * 10000 + 0.5) / 10000 AS stop_ratio
    FROM scored
    """


@query("q_lang_id", oracle=_langid_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID over {en, de, fr, es}: argmax of
    per-language stopword hit counts with a deterministic preference
    order, 'unknown' when nothing matches."""
    docs = tables.load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    hits = {lang: stopword_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "unknown")
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"], hits["es"]), "en")
        .when(hits["de"] >= F.greatest(hits["fr"], hits["es"]), "de")
        .when(hits["fr"] >= hits["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        pred.alias("lang_pred"),
        round4(best.cast("double") / F.size(toks)).alias("stop_ratio"),
    )


@query(
    "q_quality_score",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
                   AS n_uniq,
               CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
                   AS n_punct
        FROM documents
    )
    SELECT doc_id,
           floor((n_uniq / n_tokens) * 10000 + 0.5) / 10000    AS uniq_ratio,
           floor((n_punct / n_chars) * 10000 + 0.5) / 10000    AS punct_ratio,
           floor((
               0.5 * least(n_tokens / 100.0, 1.0)
             + 0.4 * (n_uniq / n_tokens)
             + 0.1 * (1.0 - least(10.0 * n_punct / n_chars, 1.0))
           ) * 10000 + 0.5) / 10000                            AS quality
    FROM feats
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score for filtering training data: length
    saturation + lexical diversity + punctuation-noise penalty, each a
    codegen'd expression."""
    docs = tables.load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("double")
    n_uniq = F.size(F.array_distinct(tokens("text"))).cast("double")
    n_punct = F.regexp_count(F.col("text"), F.lit("[^a-zA-Z0-9 ]")).cast("double")
    quality = (
        0.5 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.4 * (n_uniq / n_tokens)
        + 0.1 * (1.0 - F.least(10.0 * n_punct / n_chars, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        round4(n_uniq / n_tokens).alias("uniq_ratio"),
        round4(n_punct / n_chars).alias("punct_ratio"),
        round4(quality).alias("quality"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fingerprint
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (bag-of-words identity for shuffled/reordered
    near-copies)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens("text"))))
        ).alias("fingerprint"),
    )


_BLOCKLIST = ("slow", "big")

_CONTAM_ORACLE = """
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        FROM tok, UNNEST(range(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 3
    ),
    b AS (
        SELECT doc_id,
               instr('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS bucket
        FROM documents
    ),
    bench  AS (SELECT DISTINCT shingle FROM sh JOIN b USING (doc_id)
               WHERE bucket = 15),
    corpus AS (SELECT sh.doc_id, shingle FROM sh JOIN b USING (doc_id)
               WHERE bucket <> 15),
    sz  AS (SELECT doc_id, count(*) AS n FROM corpus GROUP BY 1),
    hit AS (SELECT doc_id, count(*) AS c
            FROM corpus JOIN bench USING (shingle) GROUP BY 1)
    SELECT hit.doc_id,
           CAST(n AS BIGINT)                          AS n_shingles,
           CAST(c AS BIGINT)                          AS n_contam,
           floor((c * 1.0 / n) * 10000 + 0.5) / 10000 AS contam_frac
    FROM hit JOIN sz USING (doc_id)
    WHERE c * 1.0 / n >= 0.5
"""


@query("q_contamination", oracle=_CONTAM_ORACLE)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose 3-gram
    shingle sets overlap a held-out 'benchmark' split (hash bucket 15,
    same deterministic md5 bucketing as queries/sampling.py) by >= 50%.
    This is the standard pre-training hygiene pass (C4/Dolma-style):
    the benchmark shingle blocklist is DISTINCT and tiny relative to
    the corpus, so it broadcasts — per-doc cost is one broadcast-hash
    probe per shingle plus a single partial-aggregated shuffle, linear
    in corpus size at 100 TB."""
    from ..operators.dedup import shingle_sets
    from .sampling import _BUCKET_SPARK

    docs = tables.load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs).withColumn("bucket", F.expr(_BUCKET_SPARK))
    bench_sh = (
        sets.where(F.col("bucket") == 15)
        .select(F.explode("shs").alias("shingle"))
        .distinct()
    )
    corpus = sets.where(F.col("bucket") != 15).select(
        "doc_id", "sz", F.explode("shs").alias("shingle")
    )
    hits = (
        corpus.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.first("sz").alias("n_shingles"), F.count("*").alias("n_contam"))
    )
    frac = F.col("n_contam") / F.col("n_shingles")
    return (
        hits.where(frac >= 0.5)
        .select("doc_id", "n_shingles", "n_contam", round4(frac).alias("contam_frac"))
    )


@query(
    "q_blocklist_filter",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (NOT list_has_any(
               string_split(lower(text), ' '),
               {list(_BLOCKLIST)!r})) AS BIGINT) AS n_clean,
           floor((CAST(count(*) FILTER (NOT list_has_any(
               string_split(lower(text), ' '),
               {list(_BLOCKLIST)!r})) AS DOUBLE) / count(*))
               * 10000 + 0.5) / 10000 AS clean_frac
    FROM documents
    GROUP BY lang
    """,
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist quality gate (the C4 'bad word list' pass):
    per-language counts of documents whose token sets avoid the
    blocklist. arrays_overlap is a codegen'd set probe; the whole
    query is one scan and one tiny aggregation exchange."""
    docs = tables.load_table(spark, sf_dir, "documents")
    flagged = F.arrays_overlap(
        tokens("text"), F.array(*[F.lit(w) for w in _BLOCKLIST])
    )
    clean = F.sum(F.when(~flagged, 1).otherwise(0))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            clean.cast("long").alias("n_clean"),
            round4(clean.cast("double") / F.count("*")).alias("clean_frac"),
        )
    )
