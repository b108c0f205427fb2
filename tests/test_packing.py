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


def test_offsets_join_keeps_plan_shallow_at_many_partitions(spark, sf_dir):
    """The per-partition offsets must come back as a broadcast-joined
    P-row dimension, not a P-deep CASE WHEN expression chain: at the
    design point P is thousands and a literal chain blows the
    analyzer/codegen limits. 256 partitions would already produce a
    visibly nested chain; assert the plan carries none and the result
    still matches the naive single window."""
    docs = tables.load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, BUDGET, partitions=256)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # the null-text guard contributes a constant handful of WHENs; the
    # old offset literal chain contributed one per partition (~255)
    assert plan.count("WHEN") < 20, "offset literal chain resurfaced"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    got = {
        r.doc_id: (r.n_tokens, r.start_bin, r.start_offset)
        for r in packed.collect()
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


def test_null_text_packs_as_zero_tokens(spark):
    """size(NULL) is -1/NULL depending on ANSI mode; either would
    corrupt the prefix sum. The operator pins null text to 0 tokens."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in pack_sequences(docs, 4).collect()}
    assert rows[2].n_tokens == 0
    # the null doc occupies zero width: doc 3 starts where doc 2 does
    assert (rows[2].start_bin, rows[2].start_offset) == (
        rows[3].start_bin, rows[3].start_offset
    )
    assert (rows[3].start_bin, rows[3].start_offset) == (0, 3)


def test_tied_order_keys_do_not_overlap(spark):
    """Duplicate id values must still receive consecutive (ROWS-frame)
    positions, not identical RANGE-frame cumulative sums: total width
    equals the token total and every start is distinct."""
    docs = spark.createDataFrame(
        [(1, "a b"), (1, "c d e"), (2, "f")], "doc_id long, text string"
    )
    rows = pack_sequences(docs, 4, partitions=2).collect()
    starts = sorted(r.start_bin * 4 + r.start_offset for r in rows)
    assert len(set(starts)) == len(rows), "tied ids overlapped"
    total = sum(r.n_tokens for r in rows)
    widths = starts[1:] + [total]
    assert all(
        w - s in {r.n_tokens for r in rows} for s, w in zip(starts, widths)
    )


def test_chunking_covers_every_token_with_overlap(spark):
    """Chunk windows must tile the token stream: window i starts at
    i*stride, consecutive windows share exactly `overlap` tokens, the
    tail is kept (short final window), and reassembling the stride
    prefixes plus the last window reproduces the document."""
    from web3_flight_rpc_server_spark.operators.chunking import (
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(23))
    docs = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, None)], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, max_tokens=8, overlap=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc, "null text must produce no chunks"
    assert [r.n_tokens for r in by_doc[2]] == [1]
    chunks = by_doc[1]
    # stride 5 over 23 tokens -> m = ceil(20/5) = 4 windows
    assert [r.chunk_idx for r in chunks] == [0, 1, 2, 3]
    toks = text.split()
    for r in chunks:
        want = toks[r.chunk_idx * 5:r.chunk_idx * 5 + 8]
        assert r.chunk_text.split() == want
        assert r.n_tokens == len(want)
    # overlap check: each window shares its first 3 tokens with the
    # previous window's last 3
    for prev, cur in zip(chunks, chunks[1:]):
        assert prev.chunk_text.split()[-3:] == cur.chunk_text.split()[:3]


def test_chunking_validates_params(spark):
    import pytest

    from web3_flight_rpc_server_spark.operators.chunking import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)
