"""Okapi BM25 relevance scoring (north-star C13 extension).

Scores every document against a small literal term set — the lexical
retrieval / quality-probe primitive a training-data pipeline uses to
find benchmark-like or topic-specific documents in a corpus. Pure
built-in expressions end to end.

Scale shape (the reason this is NOT a generic scores-against-queries
join): the term IN-list filters the exploded token stream BEFORE the
only per-doc shuffle, so shuffle volume is O(matching tokens), not
O(all tokens); document frequencies and corpus stats fold to
single-row broadcast crossJoins; the final top-k is a TakeOrdered, no
global sort. Corpus stats (N, avgdl) are a (doc_id, length)-only
aggregate — in a standing pipeline they are computed once per corpus
snapshot and reused across queries, which is how the second scan
amortizes at 100 TB.

Determinism (oracle contract): tf/df/N are integers; avgdl is an
exact integer sum divided once; the per-term partial scores are summed
in FIXED term order (a column expression chain, not a row aggregate),
so the only cross-engine wiggle is ln()'s final ulp — rounded away by
round4 before the value leaves the engine. Constants are emitted into
the oracle as CAST('…' AS DOUBLE), never bare decimal literals
(DuckDB parses those as DECIMAL and converts differently — the
operators/ivf.py lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import round4
from ..functions.text import tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_topk(docs: DataFrame, terms: list[str], top_n: int = 20,
              k1: float = DEFAULT_K1, b: float = DEFAULT_B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top ``top_n`` documents by Okapi BM25 against ``terms``.

    Output (id, score) with score round4-ed; ordering is
    (score desc, id asc) so the cut is total. Documents matching no
    term score 0 and are excluded before the shuffle.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  — always positive
    tf-part  = tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_topk terms must be distinct")

    toked = docs.select(
        id_col, tokens(text_col).alias("__toks")
    ).select(id_col, F.size("__toks").alias("dl"), "__toks")

    # one shuffle: per-doc tf for each term + the doc length, after
    # the IN-list prunes the exploded stream to matching tokens only
    tok = toked.select(
        id_col, "dl", F.explode("__toks").alias("tok")
    ).where(F.col("tok").isin(list(terms)))
    tfs = tok.groupBy(id_col).agg(
        F.min("dl").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )

    # single-row broadcasts: per-term document frequencies, corpus size
    # and average document length (exact integer sum, divided once)
    stats = tok.groupBy().agg(
        *[
            F.count_distinct(
                F.when(F.col("tok") == t, F.col(id_col))
            ).alias(f"df{i}")
            for i, t in enumerate(terms)
        ]
    )
    corpus = toked.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    joined = tfs.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(corpus))

    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    score: Column | None = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df + 0.5) / (df + 0.5)
        )
        norm = k1c * (
            F.lit(1.0) - bc + bc * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        part = idf * ((tf * (k1c + F.lit(1.0))) / (tf + norm))
        score = part if score is None else score + part

    return (
        joined.select(id_col, round4(score).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_n)
    )


def bm25_oracle_sql(terms: list[str], top_n: int = 20,
                    k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`bm25_topk` — identical tokenization,
    integer tf/df/N, fixed-order score sum, round4 floor rounding."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    tf_cols = ", ".join(
        f"count(*) FILTER (tok = '{t}') AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"count(DISTINCT {id_col}) FILTER (tok = '{t}') AS df{i}"
        for i, t in enumerate(terms)
    )
    k1s, bs = f"CAST('{k1!r}' AS DOUBLE)", f"CAST('{b!r}' AS DOUBLE)"
    score_sql = " + ".join(
        f"(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * ((CAST(tf{i} AS DOUBLE) * ({k1s} + 1.0))"
        f" / (CAST(tf{i} AS DOUBLE) + {k1s} * (1.0 - {bs} + {bs}"
        f" * (CAST(dl AS DOUBLE) / avgdl)))))"
        for i in range(len(terms))
    )
    return f"""
    WITH toked AS (
        SELECT {id_col}, string_split(lower({text_col}), ' ') AS toks
        FROM {table}
    ),
    dl AS (SELECT {id_col}, len(toks) AS dl FROM toked),
    tok AS (SELECT {id_col}, unnest(toks) AS tok FROM toked),
    m AS (SELECT {id_col}, tok FROM tok WHERE tok IN ({terms_sql})),
    tfs AS (SELECT {id_col}, {tf_cols} FROM m GROUP BY {id_col}),
    stats AS (SELECT {df_cols} FROM m),
    corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    )
    SELECT {id_col}, floor(({score_sql}) * 10000 + 0.5) / 10000 AS score
    FROM tfs JOIN dl USING ({id_col}), stats, corpus
    ORDER BY score DESC, {id_col}
    LIMIT {top_n}
    """
