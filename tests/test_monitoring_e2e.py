"""The monitoring suite composed end-to-end: a corpus "source health
check" between two ingest snapshots, the way an operator would run it
— profile drift for schema/null/cardinality, histogram distance for
value-distribution shift, rolling z-score for in-stream spikes, and
embedding centroid drift for the vector side. Each piece is tested in
depth in its own file; this pins that they compose on one dataset
without touching raw rows more than their contracts promise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.histograms import (
    build_histograms,
    histogram_distance,
)
from web3_flight_rpc_server_spark.operators.profile import (
    profile_drift,
    profile_table,
)
from web3_flight_rpc_server_spark.operators.sequencing import rolling_zscore
from web3_flight_rpc_server_spark.operators.similarity import embedding_drift


@pytest.fixture(scope="module")
def snapshots(spark):
    """Yesterday: healthy. Today: nulls spiked, lengths doubled, and
    the embedding population flipped axis — every monitor should fire
    on exactly its own signal."""
    old = spark.createDataFrame(
        [(i, "w " * 20, [1.0, 0.0]) for i in range(40)],
        "doc_id long, text string, embedding array<double>",
    )
    new_rows = [
        (i, None if i % 4 == 0 else "w " * 40, [0.0, 1.0])
        for i in range(40)
    ]
    new = spark.createDataFrame(
        new_rows, "doc_id long, text string, embedding array<double>"
    )
    return old, new


def _with_len(df):
    return df.withColumn(
        "n_chars", F.length(F.coalesce(F.col("text"), F.lit("")))
    )


def test_profile_drift_fires_on_null_spike(snapshots):
    old, new = snapshots
    rep = {
        r.column: r
        for r in profile_drift(
            profile_table(old, exact_distinct=True),
            profile_table(new, exact_distinct=True),
        ).collect()
    }
    assert "null_spike" in rep["text"].flags
    assert not rep["doc_id"].drifted


def test_histogram_distance_fires_on_length_shift(snapshots):
    old, new = snapshots
    h = lambda df: build_histograms(  # noqa: E731
        _with_len(df), [], "n_chars", 0.0, 200.0, bins=20
    )
    d = histogram_distance(h(old), h(new), []).collect()[0]
    assert d.total_variation > 0.9  # disjoint length modes


def test_zscore_fires_on_the_spike_row_only(spark):
    rows = [(1, t, 40.0) for t in range(10)] + [(1, 10, 400.0)]
    df = spark.createDataFrame(rows, "src long, t long, n_chars double")
    out = rolling_zscore(df, "n_chars", ["src"], ts_col="t", lookback=8)
    flagged = [r.t for r in out.collect() if r.is_anomaly]
    assert flagged == [10]


def test_embedding_drift_fires_on_axis_flip(snapshots):
    old, new = snapshots
    d = embedding_drift(old, new).collect()[0]
    assert d.centroid_cosine == pytest.approx(0.0)
    assert (d.n_a, d.n_b) == (40, 40)
