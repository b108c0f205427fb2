"""Mergeable HLL distinct sketches (operators/sketches.py).

The property under test is MERGEABILITY — the thing that makes the
operator the 100 TB shape: per-bucket sketches persisted once must
answer arbitrary rollups by union alone, agreeing with a direct
distinct over the same raw rows, across partial-merge order and a
parquet roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.sketches import (
    SKETCH_COL,
    build_distinct_sketches,
    rollup_distinct,
)
from web3_flight_rpc_server_spark.sources import tables


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return tables.load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )


def _exact(events, *cols):
    return {
        tuple(r[c] for c in cols): r["n"]
        for r in events.groupBy(*cols)
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }


def test_merged_daily_matches_exact_within_rse(events):
    daily = build_distinct_sketches(events, ["day", "event_type"], "user_id")
    rolled = {
        r["event_type"]: r["n_distinct_est"]
        for r in rollup_distinct(daily, ["event_type"]).collect()
    }
    exact = _exact(events, "event_type")
    assert set(rolled) == {k for (k,) in exact}
    for et, est in rolled.items():
        assert abs(est - exact[(et,)]) <= max(2, 0.05 * exact[(et,)]), (
            f"{et}: est {est} vs exact {exact[(et,)]}"
        )


def test_partial_merge_order_is_exact_reaggregation(events):
    """day -> month -> total must equal day -> total: the union is
    associative, so staged partial merges (the distributed map-side
    combine shape) give the SAME final estimate, not merely a close
    one."""
    daily = build_distinct_sketches(events, ["day", "event_type"], "user_id")
    one_stage = rollup_distinct(daily, []).collect()[0]["n_distinct_est"]
    monthly = (
        daily.withColumn("month", F.trunc("day", "month"))
        .groupBy("month")
        .agg(F.hll_union_agg(SKETCH_COL, F.lit(False)).alias(SKETCH_COL))
    )
    two_stage = (
        monthly.agg(F.hll_union_agg(SKETCH_COL, F.lit(False)).alias(SKETCH_COL))
        .select(F.hll_sketch_estimate(SKETCH_COL).alias("e"))
        .collect()[0]["e"]
    )
    assert one_stage == two_stage


def test_persisted_sketches_answer_range_queries(events, tmp_path):
    """The serving pattern end-to-end: write bucket sketches to
    parquet, read them back cold, merge a date-range subset, and agree
    with the exact distinct over the same range — raw rows untouched
    after the build pass."""
    path = str(tmp_path / "sketches")
    build_distinct_sketches(events, ["day"], "user_id").write.parquet(path)
    spark = events.sparkSession
    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    lo, hi = days[0], days[len(days) // 2]
    est = (
        rollup_distinct(
            spark.read.parquet(path).where(F.col("day").between(lo, hi)), []
        )
        .collect()[0]["n_distinct_est"]
    )
    exact = (
        events.where(F.col("day").between(lo, hi))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]["n"]
    )
    assert abs(est - exact) <= max(2, 0.05 * exact)


def test_mixed_lg_k_refused_unless_allowed(events):
    a = build_distinct_sketches(events, ["event_type"], "user_id", lg_k=12)
    b = build_distinct_sketches(events, ["event_type"], "user_id", lg_k=14)
    mixed = a.unionByName(b)
    with pytest.raises(ValueError, match="lg_k"):
        rollup_distinct(mixed, ["event_type"])
    out = rollup_distinct(mixed, ["event_type"], allow_different_lg_k=True)
    exact = _exact(events, "event_type")
    for r in out.collect():
        want = exact[(r["event_type"],)]
        assert abs(r["n_distinct_est"] - want) <= max(2, 0.05 * want)


def test_lg_k_bounds_validated(events):
    with pytest.raises(ValueError, match="lg_k"):
        build_distinct_sketches(events, ["day"], "user_id", lg_k=3)


def test_build_is_single_shuffle_partial_agg(events):
    """The raw pass is one Exchange on the bucket key with map-side
    partial sketch aggregation — the only plan that survives 100 TB."""
    daily = build_distinct_sketches(events, ["day", "event_type"], "user_id")
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_hll_sketch_agg" in plan


def test_duplicate_sketch_rows_do_not_corrupt_the_union(events):
    """Register-wise max makes the union idempotent over REPEATED
    SKETCH ROWS, not just repeated values — an at-least-once replay
    that appends the same bucket sketch twice leaves every rollup
    estimate unchanged. This is what lets sketch maintenance ride a
    plain append pipeline without the exactly-once sink."""
    daily = build_distinct_sketches(events, ["day", "event_type"], "user_id")
    once = {
        r["event_type"]: r["n_distinct_est"]
        for r in rollup_distinct(daily, ["event_type"]).collect()
    }
    doubled = daily.unionByName(daily)
    twice = {
        r["event_type"]: r["n_distinct_est"]
        for r in rollup_distinct(doubled, ["event_type"]).collect()
    }
    assert once == twice


def test_streaming_maintenance_and_compaction(spark, tmp_path):
    """readStream -> per-batch sketch appends -> rollup serves the
    running distinct; a simulated replay (re-appending a batch's
    sketches) changes nothing, and compaction folds the accumulated
    rows to one per bucket with identical estimates."""
    from web3_flight_rpc_server_spark.operators.sketches import (
        compact_sketches,
        streaming_sketch_maintenance,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "sketches")
    schema = "user_id long, event_type string"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop([(1, "a"), (2, "a"), (1, "b")])
    q = streaming_sketch_maintenance(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        table,
        ["event_type"],
        "user_id",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        drop([(3, "a"), (1, "a")])
        q.processAllAvailable()
    finally:
        q.stop()

    def estimates():
        return {
            r["event_type"]: r["n_distinct_est"]
            for r in rollup_distinct(
                spark.read.parquet(table), ["event_type"]
            ).collect()
        }

    want = {"a": 3, "b": 1}
    assert estimates() == want
    # simulated at-least-once replay: duplicate a batch's sketch rows
    dup = spark.read.parquet(table).limit(1)
    dup.write.mode("append").parquet(table)
    assert estimates() == want, "replayed sketch rows moved an estimate"
    compact_sketches(spark, table)
    compacted = spark.read.parquet(table)
    assert compacted.count() == 2  # one row per bucket
    assert estimates() == want


def test_intersection_estimate_by_inclusion_exclusion(events):
    """|A ∩ B| from sketches alone, within the compounded error of
    three estimates at comparable magnitudes: split events into two
    overlapping day ranges and compare to the exact overlap."""
    from web3_flight_rpc_server_spark.operators.sketches import (
        intersect_distinct_estimate,
    )

    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    a_hi = days[2 * len(days) // 3]
    b_lo = days[len(days) // 3]
    ev_a = events.where(F.col("day") <= a_hi)
    ev_b = events.where(F.col("day") >= b_lo)
    est = intersect_distinct_estimate(
        build_distinct_sketches(ev_a, ["day"], "user_id"),
        build_distinct_sketches(ev_b, ["day"], "user_id"),
    ).collect()[0]
    exact = (
        ev_a.select("user_id")
        .intersect(ev_b.select("user_id"))
        .count()
    )
    # three compounded estimates: allow 3x the single-sketch gate
    assert abs(est.n_intersect_est - exact) <= max(6, 0.15 * exact), (
        f"est {est.n_intersect_est} vs exact {exact}"
    )
    assert est.n_intersect_est >= 0
