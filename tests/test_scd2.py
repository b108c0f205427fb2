"""SCD2 history builder / incremental merge (operators/scd2.py)
against hand-computed interval truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.scd2 import (
    asof_lookup,
    scd2_from_history,
    scd2_merge,
)


def _hist(spark, rows):
    return spark.createDataFrame(rows, "key string, ts long, label string")


def _rows(df):
    return {
        (r.key, r.label, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_intervals_and_noop_dropping(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 20, "x"),   # no-op: same label -> no new version
        ("a", 30, "y"),
        ("b", 15, "z"),
    ]), key_col="key", ts_col="ts")
    assert _rows(scd) == {
        ("a", "x", 10, 30, False),
        ("a", "y", 30, None, True),
        ("b", "z", 15, None, True),
    }


def test_same_instant_ties_last_writer_wins_deterministically(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 10, "w"),   # tie on ts: max attribute tuple wins
    ]))
    assert _rows(scd) == {("a", "x", 10, None, True)}


def test_merge_touches_only_changed_keys(spark):
    existing = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("b", 10, "y"),
    ]))
    merged = scd2_merge(existing, _hist(spark, [("a", 20, "x2")]))
    assert _rows(merged) == {
        ("a", "x", 10, 20, False),
        ("a", "x2", 20, None, True),
        ("b", "y", 10, None, True),
    }
    # rebuilding from the full history must agree (merge == rebuild)
    full = scd2_from_history(_hist(spark, [
        ("a", 10, "x"), ("b", 10, "y"), ("a", 20, "x2"),
    ]))
    assert _rows(merged) == _rows(full)


def test_merge_drops_noop_change(spark):
    existing = scd2_from_history(_hist(spark, [("a", 10, "x")]))
    merged = scd2_merge(existing, _hist(spark, [("a", 20, "x")]))
    assert _rows(merged) == {("a", "x", 10, None, True)}


def test_asof_lookup_resolves_version_at_fact_time(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 30, "y"),
    ]))
    facts = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 29), ("a", 30), ("a", 99), ("c", 50)],
        "key string, fts long",
    )
    got = {
        (r.key, r.fts, r.label)
        for r in asof_lookup(facts, scd, "key", "fts").collect()
    }
    assert got == {
        ("a", 5, None),      # before first version
        ("a", 10, "x"),
        ("a", 29, "x"),
        ("a", 30, "y"),      # boundary: valid_from inclusive
        ("a", 99, "y"),
        ("c", 50, None),     # unknown key
    }


def test_requires_attribute_columns(spark):
    with pytest.raises(ValueError):
        scd2_from_history(
            spark.createDataFrame([("a", 1)], "key string, ts long")
        )


def test_asof_lookup_colliding_columns_prefixed_or_refused(spark):
    """Facts sharing an attribute name with the dimension must either
    get an explicit prefix on the dimension's columns or fail loudly —
    never produce a duplicate-name schema that breaks the next
    select-by-name."""
    scd = scd2_from_history(_hist(spark, [("a", 10, "x"), ("a", 30, "y")]))
    facts = spark.createDataFrame(
        [("a", 20, "fact-label")], "key string, fts long, label string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_lookup(facts, scd, "key", "fts")
    out = asof_lookup(facts, scd, "key", "fts", prefix="dim_")
    assert out.columns.count("label") == 1
    row = out.select("key", "fts", "label", "dim_label").collect()[0]
    assert (row.key, row.fts, row.label, row.dim_label) == (
        "a", 20, "fact-label", "x"
    )
