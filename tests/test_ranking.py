"""BM25 relevance scoring (operators/ranking.py) against constructed
truth; the declared q_bm25's oracle parity runs in test_oracle_parity."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.ranking import bm25_topk
from web3_flight_rpc_server_spark.sources import tables


def test_bm25_orders_by_tf_at_equal_length(spark):
    """Same length, same df environment: more query-term occurrences
    must score strictly higher; a doc with no query term is absent."""
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad pad pad"),
            (2, "spark spark pad pad pad pad pad pad"),
            (3, "spark pad pad pad pad pad pad pad"),
            (4, "pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark"], top_n=10).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert rows[0].score > rows[1].score > rows[2].score > 0


def test_bm25_length_normalization(spark):
    """Equal tf: the shorter document wins (b > 0)."""
    docs = spark.createDataFrame(
        [
            (1, "spark pad pad pad"),
            (2, "spark pad pad pad pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark"], top_n=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].score > rows[1].score


def test_bm25_multi_term_and_top_n(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    rows = bm25_topk(docs, ["spark", "vector", "stream"], top_n=7).collect()
    assert len(rows) == 7
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_rejects_bad_terms(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["a", "a"])
