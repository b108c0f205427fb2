"""Document chunking: split long documents into overlapping
fixed-token windows (north-star C13/C19 adjunct — the complement of
operators/packing.py, which concatenates SHORT documents; real
pretraining pipelines do both: chunk the long tail, pack the short
head).

Each document's token stream is cut into windows of ``max_tokens``
advancing by ``stride = max_tokens - overlap``; consecutive windows
share ``overlap`` tokens so no span of context is lost at a boundary,
and the final window is allowed to run short rather than dropping the
tail. Window count per doc: m = ceil((n - overlap) / stride) for
n > overlap, else 1 — every token is covered, window i spans tokens
[i*stride, i*stride + max_tokens).

Shape: pure built-in expressions — tokenize once into a materialized
attribute, derive the per-doc window count arithmetically, posexplode
a ``sequence`` of window indices, and slice the token array in-row.
One Generate per doc (row explosion proportional to output), no
shuffle, no UDF; at 100 TB this is a map-only stage that parallelizes
with the scan. Deterministic: the same document always chunks
identically, so replays and cross-engine checks are exact (DuckDB
oracle twin below, fuzzed in tests/test_oracle_fuzz.py).

No counterpart in the reference (its payloads are fixed-schema rows,
never free text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def _validate(max_tokens: int, overlap: int) -> int:
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got overlap={overlap} "
            f"max_tokens={max_tokens}"
        )
    return max_tokens - overlap


def chunk_documents(docs: DataFrame, max_tokens: int = 512,
                    overlap: int = 64, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — one row per window.
    Null-text documents produce no chunks (there is nothing to cut);
    empty-ish documents produce exactly one short chunk."""
    stride = _validate(max_tokens, overlap)
    toked = docs.where(F.col(text_col).isNotNull()).select(
        id_col, tokens(text_col).alias("__toks")
    )
    n = F.size("__toks")
    m = F.when(
        n > overlap,
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    ).otherwise(F.lit(1))
    counted = toked.select(id_col, "__toks", m.alias("__m"))
    start = F.col("chunk_idx") * stride  # 0-based token offset
    piece = F.slice("__toks", start + 1, max_tokens)
    return (
        counted.select(
            id_col,
            "__toks",
            F.posexplode(F.sequence(F.lit(0), F.col("__m") - 1)).alias(
                "chunk_idx", "__unused"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )


def chunk_oracle_sql(max_tokens: int = 512, overlap: int = 64,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB twin: same window arithmetic over string_split tokens."""
    stride = _validate(max_tokens, overlap)
    return f"""
    WITH t AS (
        SELECT {id_col}, string_split(lower({text_col}), ' ') AS ts
        FROM {table}
        WHERE {text_col} IS NOT NULL
    ),
    c AS (
        SELECT {id_col}, ts, len(ts) AS n,
               CASE WHEN len(ts) > {overlap}
                    THEN CAST(ceil((len(ts) - {overlap}) * 1.0
                                   / {stride}) AS INT)
                    ELSE 1 END AS m
        FROM t
    ),
    e AS (
        SELECT {id_col}, ts, n, unnest(range(m)) AS i FROM c
    )
    SELECT {id_col},
           CAST(i AS INT) AS chunk_idx,
           array_to_string(
               list_slice(ts, i * {stride} + 1,
                          least(i * {stride} + {max_tokens}, n)), ' '
           ) AS chunk_text,
           CAST(least(i * {stride} + {max_tokens}, n) - i * {stride}
                AS BIGINT) AS n_tokens
    FROM e
    """


def chunk_token_ids(docs: DataFrame, max_tokens: int = 512,
                    overlap: int = 64, id_col: str = "doc_id",
                    ids_col: str = "token_ids") -> DataFrame:
    """(id, chunk_idx, chunk_ids, n_tokens) — the same overlapping
    windowing as :func:`chunk_documents`, but over an ALREADY-ENCODED
    ``array<long>`` id column, so the window budget counts REAL
    subword tokens (what a trainer's sequence length means). Use
    after operators/vocab.py:bpe_encode_ids when chunk boundaries
    should land in id space rather than whitespace space — mid-word
    subword splits at window edges are inherent to id-space chunking
    and are exactly what production token-window pipelines do.

    Null id arrays produce no chunks; empty arrays produce one empty
    chunk (mirroring chunk_documents' empty-ish contract). Map-only:
    one posexplode per document, no shuffle — the identical scale
    shape as the text chunker (sf10 exponent 0.34)."""
    stride = _validate(max_tokens, overlap)
    based = docs.where(F.col(ids_col).isNotNull()).select(
        id_col, F.col(ids_col).alias("__ids")
    )
    n = F.size("__ids")
    m = F.when(
        n > overlap,
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    ).otherwise(F.lit(1))
    counted = based.select(id_col, "__ids", m.alias("__m"))
    start = F.col("chunk_idx") * stride
    piece = F.slice("__ids", start + 1, max_tokens)
    return (
        counted.select(
            id_col,
            "__ids",
            F.posexplode(F.sequence(F.lit(0), F.col("__m") - 1)).alias(
                "chunk_idx", "__unused"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            piece.alias("chunk_ids"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )
