"""Sequence packing for pretraining (north-star C19/C13 adjunct).

Training consumes fixed-length sequences, not documents: the corpus
is concatenated in a deterministic order and cut every ``budget``
tokens (GPT-style packing with document spanning). The operator maps
each document to its position in that packed stream — (start_bin,
start_offset, n_tokens) — from which a writer can emit the physical
sequences; the mapping is the part that needs a distributed engine,
and it is pure prefix arithmetic:

    start(doc)     = sum of n_tokens over all docs ordered before it
    start_bin      = start div budget
    start_offset   = start mod budget

The global prefix sum is the scale problem: a single
``Window.orderBy(id)`` collapses to ONE partition (Spark warns and
serializes). This implementation is the classic two-phase prefix sum:
range-partition by the order key, cumsum locally per partition (a
partitioned window — parallel), collect only the P per-partition
totals to the driver (P numbers, not rows), and add each partition's
cumulative offset back via a broadcast equi-join on the partition id
— a P-row dimension, O(1) plan depth regardless of P. (An earlier
version folded the offsets into a nested ``when`` chain; at the
100 TB design point P is thousands and a thousand-deep expression
tree hits the analyzer/codegen 64 KB-method limits long before the
data does.) Identical result to the single-window formulation, no
serialization point — pinned by both a pytest equivalence check and
a DuckDB window-SQL oracle (test_oracle_parity runs the undeclared
q_pack registry entry).

No counterpart in the reference; deterministic like the
queries/sampling.py split ops — the same corpus always packs
identically, so replays and cross-engine checks are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..functions.text import tokens


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   partitions: int | None = None,
                   n_tokens_col: str | None = None) -> DataFrame:
    """(id, n_tokens, start_bin, start_offset) under concatenate-and-
    cut packing in ``id_col`` order. A document with
    start_offset + n_tokens > budget spans into the next bin(s) —
    exactly what a packed-pretraining writer does.

    ``n_tokens_col`` names a precomputed length column to pack by —
    the tokenizer-aware path: a corpus encoded with bpe_encode_ids
    packs by ``size(token_ids)`` (real subword counts), not the
    whitespace proxy. Null lengths pack as 0 tokens, same convention
    as null text."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    # size(NULL) is -1 (legacy) or NULL (ANSI) in Spark — either way a
    # null text would corrupt the prefix sum (negative counts, or a
    # null that the window skips while downstream math propagates it).
    # Branch on the text itself so the convention is explicit: null
    # text packs as 0 tokens, mirrored in the oracle SQL.
    if n_tokens_col is not None:
        toked = docs.select(
            id_col,
            F.coalesce(
                F.col(n_tokens_col).cast("long"), F.lit(0).cast("long")
            ).alias("n_tokens"),
        )
    else:
        toked = docs.select(
            id_col,
            F.when(F.col(text_col).isNull(), F.lit(0).cast("long"))
            .otherwise(F.size(tokens(text_col)).cast("long"))
            .alias("n_tokens"),
        )
    parted = toked.repartitionByRange(p, id_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    # phase 1: per-partition running sums (parallel window). Persisted
    # via the shared cache ledger (operators/dedup.py): the totals
    # collect below and the returned plan both read it; long-lived
    # hosts release with release_caches().
    from .dedup import _persisted

    # ROWS frame, not the default RANGE: RANGE gives tied order-key
    # values identical cumulative sums (overlapping pack positions),
    # silently diverging from the ROWS-framed oracle when ids repeat
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = _persisted(parted.withColumn("__cum", F.sum("n_tokens").over(w)))
    # phase 2: P partition totals -> cumulative offsets (driver-side,
    # P values — not a row collect), rejoined as a broadcast P-row
    # dimension so the plan stays O(1) deep at any partition count
    totals = {
        r["__pid"]: r["total"]
        for r in local.groupBy("__pid")
        .agg(F.max("__cum").alias("total"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    offset_df = local_df(
        spark, offsets or [(0, 0)], "__pid int, __off long"
    )
    start = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    out = (
        local.join(F.broadcast(offset_df), "__pid", "left")
        .select(
            id_col,
            "n_tokens",
            start.alias("__start"),
        )
    ).select(
        id_col,
        "n_tokens",
        F.expr(f"__start div {budget}").alias("start_bin"),
        (F.col("__start") % budget).alias("start_offset"),
    )
    return out


def pack_oracle_sql(budget: int = 2048, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin: single window cumsum (fine at oracle scale)."""
    return f"""
    WITH t AS (
        SELECT {id_col},
               CASE WHEN {text_col} IS NULL THEN CAST(0 AS BIGINT)
                    ELSE CAST(len(string_split(lower({text_col}), ' '))
                              AS BIGINT)
               END AS n_tokens
        FROM {table}
    ),
    c AS (
        SELECT {id_col}, n_tokens,
               sum(n_tokens) OVER (ORDER BY {id_col}
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start
        FROM t
    )
    SELECT {id_col}, n_tokens,
           CAST(start // {budget} AS BIGINT) AS start_bin,
           CAST(start % {budget} AS BIGINT)  AS start_offset
    FROM c
    """
