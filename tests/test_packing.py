"""Sequence packing (operators/packing.py): the two-phase distributed
prefix sum must equal the naive single-window formulation, and the
packed stream must be gapless."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.functions.text import tokens
from web3_flight_rpc_server_spark.operators.dedup import release_caches
from web3_flight_rpc_server_spark.operators.packing import pack_sequences
from web3_flight_rpc_server_spark.sources import tables

BUDGET = 512


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def test_two_phase_equals_single_window(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.n_tokens, r.start_bin, r.start_offset)
        for r in pack_sequences(docs, BUDGET, partitions=7).collect()
    }
    naive = (
        docs.select(
            "doc_id", F.size(tokens("text")).cast("long").alias("n")
        )
        .withColumn(
            "start",
            F.sum("n").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n"),
        )
        .collect()
    )
    want = {
        r.doc_id: (r.n, r.start // BUDGET, r.start % BUDGET) for r in naive
    }
    assert got == want


def test_packed_stream_is_gapless_and_ordered(spark, sf_dir):
    """Concatenate-and-cut invariants: starts are exactly the prefix
    sums (no gaps, no overlaps) and bins fill to the budget before the
    next one starts."""
    docs = tables.load_table(spark, sf_dir, "documents")
    rows = sorted(
        pack_sequences(docs, BUDGET).collect(), key=lambda r: r.doc_id
    )
    pos = 0
    for r in rows:
        assert r.start_bin * BUDGET + r.start_offset == pos, r
        assert 0 <= r.start_offset < BUDGET
        pos += r.n_tokens
    assert pos == sum(r.n_tokens for r in rows)


def test_budget_validation(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
