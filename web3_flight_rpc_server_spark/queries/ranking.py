"""Relevance-scoring query (north-star C13 extension): Okapi BM25 of
every document against a literal term set, top-k. See
operators/ranking.py for the scale shape and determinism contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ranking import bm25_oracle_sql, bm25_topk
from ..registry import query
from ..sources import tables

# Three mid-frequency corpus terms: every document tokenizes them the
# same way in both engines, and the scores spread on tf and length
# normalization, so the top-20 cut is exercised for real.
_TERMS = ["spark", "vector", "stream"]
_TOP_N = 20


@query("q_bm25", oracle=bm25_oracle_sql(_TERMS, _TOP_N))
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 against a 3-term query (C13 relevance
    scoring): explode -> IN-list prune BEFORE the per-doc shuffle ->
    one tf aggregation -> single-row broadcast df/corpus stats ->
    fixed-order score sum -> TakeOrdered. The oracle recomputes the
    identical integer tf/df/N and the same fixed-order double
    arithmetic; round4 absorbs ln()'s final ulp."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _TERMS, top_n=_TOP_N)
