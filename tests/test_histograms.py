"""Mergeable quantile histograms (operators/histograms.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.histograms import (
    COUNTS_COL,
    build_histograms,
    merge_histograms,
    percentile_estimate,
)
from web3_flight_rpc_server_spark.sources import tables


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return tables.load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )


def _bounds(events):
    r = events.agg(F.min("value"), F.max("value")).collect()[0]
    return float(r[0]), float(r[1]) + 1e-9


def test_counts_exact_on_constructed_rows(spark):
    df = spark.createDataFrame(
        [(x,) for x in [0.0, 0.5, 1.0, 1.5, 3.9, -2.0, 99.0, None]],
        "v double",
    )
    h = build_histograms(df, [], "v", lo=0.0, hi=4.0, bins=4).collect()[0]
    assert h[COUNTS_COL] == [2, 2, 0, 1]  # [0,1):2  [1,2):2  [2,3):0  [3,4):1
    assert (h.n_below, h.n_above) == (1, 1)


def test_merge_is_exact_elementwise_addition(events):
    lo, hi = _bounds(events)
    daily = build_histograms(events, ["day", "event_type"], "value", lo, hi)
    merged = {
        r.event_type: (r[COUNTS_COL], r.n_below, r.n_above)
        for r in merge_histograms(daily, ["event_type"]).collect()
    }
    direct = {
        r.event_type: (r[COUNTS_COL], r.n_below, r.n_above)
        for r in build_histograms(events, ["event_type"], "value", lo, hi).collect()
    }
    assert merged == direct  # exact equality — counts, not estimates


def test_percentile_within_one_bin_width(events):
    lo, hi = _bounds(events)
    bins = 256
    width = (hi - lo) / bins
    daily = build_histograms(events, ["day"], "value", lo, hi, bins=bins)
    est = (
        merge_histograms(daily, [])
        .select(
            percentile_estimate(0.5).alias("p50"),
            percentile_estimate(0.9).alias("p90"),
        )
        .collect()[0]
    )
    exact = events.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
    ).collect()[0]
    assert abs(est.p50 - exact.p50) <= width
    assert abs(est.p90 - exact.p90) <= width


def test_persisted_roundtrip_range_query(events, tmp_path):
    lo, hi = _bounds(events)
    path = str(tmp_path / "hists")
    build_histograms(events, ["day"], "value", lo, hi, bins=256).write.parquet(
        path
    )
    spark = events.sparkSession
    days = sorted(r.day for r in events.select("day").distinct().collect())
    cut = days[len(days) // 2]
    est = (
        merge_histograms(
            spark.read.parquet(path).where(F.col("day") <= cut), []
        )
        .select(percentile_estimate(0.5).alias("p50"))
        .collect()[0]
        .p50
    )
    exact = (
        events.where(F.col("day") <= cut)
        .agg(F.percentile("value", F.lit(0.5)).alias("p50"))
        .collect()[0]
        .p50
    )
    assert abs(est - exact) <= (hi - lo) / 256


def test_mixed_configs_refused(events):
    lo, hi = _bounds(events)
    a = build_histograms(events, ["event_type"], "value", lo, hi, bins=64)
    b = build_histograms(events, ["event_type"], "value", lo, hi, bins=128)
    with pytest.raises(ValueError, match="mixed"):
        merge_histograms(a.unionByName(b), ["event_type"])


def test_validation():
    with pytest.raises(ValueError, match="lo < hi"):
        build_histograms(None, [], "v", 1.0, 1.0)
    with pytest.raises(ValueError, match="bins"):
        build_histograms(None, [], "v", 0.0, 1.0, bins=0)
    with pytest.raises(ValueError, match="q must be"):
        percentile_estimate(1.5)


def test_build_is_bounded_state_two_level_agg(events):
    lo, hi = _bounds(events)
    plan = (
        build_histograms(events, ["day"], "value", lo, hi)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # (bucket, bin) count -> bucket assembly: two exchanges, and the
    # only list aggregation is over <= bins+2 per-bin rows
    assert plan.count("Exchange") <= 2


def test_streaming_maintenance_survives_engine_replay(spark, tmp_path):
    """Count summaries double on replay, so the maintenance must ride
    the exactly-once sink: force a genuine engine replay (checkpoint
    restore) and assert the merged histogram still equals a direct
    build over exactly the rows seen once."""
    import shutil

    from web3_flight_rpc_server_spark.operators.histograms import (
        read_merged_histograms,
        streaming_histogram_maintenance,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "hists")
    ckpt = str(tmp_path / "ckpt")
    ckpt_bak = str(tmp_path / "ckpt_bak")
    schema = "g string, v double"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start():
        return streaming_histogram_maintenance(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            out,
            ["g"],
            "v",
            lo=0.0,
            hi=10.0,
            bins=10,
            checkpoint=ckpt,
        )

    drop([("a", 1.5), ("a", 2.5), ("b", 1.5)])
    q = start()
    q.processAllAvailable()
    q.stop()
    shutil.copytree(ckpt, ckpt_bak)
    drop([("a", 2.7), ("b", 9.1)])
    q = start()
    q.processAllAvailable()
    q.stop()
    # crash: restore the stale checkpoint -> engine replays the epoch
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_bak, ckpt)
    q = start()
    q.processAllAvailable()
    q.stop()

    merged = {
        r.g: r[COUNTS_COL]
        for r in read_merged_histograms(spark, out, ["g"]).collect()
    }
    direct = {
        r.g: r[COUNTS_COL]
        for r in build_histograms(
            spark.read.parquet(src), ["g"], "v", 0.0, 10.0, 10
        ).collect()
    }
    assert merged == direct, "replayed epoch double-counted"


def test_histogram_distance_detects_shift(spark):
    from web3_flight_rpc_server_spark.operators.histograms import (
        histogram_distance,
    )

    def h(rows):
        return build_histograms(
            spark.createDataFrame(rows, "g string, v double"),
            ["g"], "v", 0.0, 10.0, bins=5,
        )

    old = h([("a", 1.0)] * 8 + [("a", 9.0)] * 2 + [("b", 5.0)] * 4)
    # 'a' shifts mass to the top bin; 'b' unchanged; 'c' is new
    new = h([("a", 1.0)] * 2 + [("a", 9.0)] * 8 + [("b", 5.0)] * 4
            + [("c", 3.0)] * 3)
    d = {r.g: r for r in histogram_distance(old, new, ["g"]).collect()}
    assert d["b"].total_variation == 0.0
    assert abs(d["a"].total_variation - 0.6) < 1e-9  # 0.8->0.2 swap
    assert d["c"].l1_distance is None  # no basis: missing on one side
    assert (d["c"].n_a, d["c"].n_b) == (None, 3)


def test_histogram_distance_refuses_mixed_configs(spark):
    from web3_flight_rpc_server_spark.operators.histograms import (
        histogram_distance,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    a = build_histograms(df, ["g"], "v", 0.0, 10.0, bins=5)
    b = build_histograms(df, ["g"], "v", 0.0, 10.0, bins=6)
    with pytest.raises(ValueError, match="configs differ"):
        histogram_distance(a, b, ["g"])
