"""Mergeable heavy-hitter summaries (operators/heavy_hitters.py).

The property under test is BOUND HONESTY under truncation: for every
reported item lb <= true <= ub, every item whose true count exceeds
the merged total error surfaces, and guaranteed_above never
false-positives — on data engineered so per-bucket top-K genuinely
drops items."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.heavy_hitters import (
    build_topk_summaries,
    guaranteed_above,
    merge_topk,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """3 buckets x items with engineered skew: 'hot' everywhere,
    'warm' hot in one bucket only, long tail of singletons."""
    rows = []
    for b in range(3):
        rows += [(b, "hot")] * 50
        rows += [(b, "warm")] * (40 if b == 0 else 2)
        rows += [(b, f"tail{b}_{i}") for i in range(30)]
    return spark.createDataFrame(rows, "bucket int, item string")


def _exact(df):
    return {
        r.item: r.n
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }


def test_bounds_contain_truth_under_truncation(skewed):
    s = build_topk_summaries(skewed, ["bucket"], "item", k=5)
    merged = merge_topk(s, [], ["bucket"])
    exact = _exact(skewed)
    rows = merged.collect()
    assert rows, "no items surfaced"
    for r in rows:
        assert r.lb <= exact[r.item] <= r.ub, (
            f"{r.item}: [{r.lb}, {r.ub}] vs true {exact[r.item]}"
        )
    by_item = {r.item: r for r in rows}
    # items above the total error are guaranteed to surface
    total_err = rows[0].total_err
    assert total_err > 0, "fixture must actually truncate"
    for item, n in exact.items():
        if n > total_err:
            assert item in by_item, f"{item} (true {n}) missing"
    # guaranteed_above: no false positives at any threshold we try
    for thr in (10, 50, 100):
        for r in guaranteed_above(merged, thr).collect():
            assert exact[r.item] >= thr


def test_no_truncation_merge_is_exact(skewed):
    """K above every bucket's cardinality -> err_bound 0 everywhere,
    lb == ub == exact count: the regime the cross-engine query runs."""
    s = build_topk_summaries(skewed, ["bucket"], "item", k=1000)
    merged = {r.item: r for r in merge_topk(s, [], ["bucket"]).collect()}
    for item, n in _exact(skewed).items():
        r = merged[item]
        assert (r.lb, r.ub, r.total_err) == (n, n, 0)


def test_grouped_merge_keeps_buckets_separate(skewed):
    """Merging day-buckets up to a coarser group must only sum WITHIN
    the group: tag each bucket with a parity group and check 'warm'
    bounds differ across groups."""
    tagged = skewed.withColumn("grp", F.col("bucket") % 2)
    s = build_topk_summaries(tagged, ["grp", "bucket"], "item", k=5)
    merged = {
        (r.grp, r.item): r for r in merge_topk(s, ["grp"], ["grp", "bucket"]).collect()
    }
    exact0 = _exact(tagged.where(F.col("grp") == 0))
    exact1 = _exact(tagged.where(F.col("grp") == 1))
    r0, r1 = merged[(0, "hot")], merged[(1, "hot")]
    assert r0.lb <= exact0["hot"] <= r0.ub
    assert r1.lb <= exact1["hot"] <= r1.ub
    assert r0.lb != r1.lb  # 2 buckets vs 1 bucket of 'hot'


def test_null_items_ignored(spark):
    df = spark.createDataFrame(
        [(0, "a"), (0, None), (0, "a")], "bucket int, item string"
    )
    s = build_topk_summaries(df, ["bucket"], "item", k=10)
    assert {(r.item, r.n) for r in s.collect()} == {("a", 2)}


def test_k_validated(skewed):
    with pytest.raises(ValueError, match="k must be"):
        build_topk_summaries(skewed, ["bucket"], "item", k=0)


def test_streaming_maintenance_epochs_as_buckets(spark, tmp_path):
    """Count-based summaries double on replay, so streamed top-K
    maintenance rides the exactly-once epoch sink — and needs no new
    machinery: each committed epoch IS a bucket (its err_bound
    algebra included), so serving is merge_topk over the committed
    epochs with ``epoch`` as the bucket column."""
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        ExactlyOnceParquetSink,
        read_committed,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "topk")
    schema = "item string"
    sink = ExactlyOnceParquetSink(
        out,
        transform=lambda df: build_topk_summaries(df, [], "item", k=2),
    )

    def drop(rows):
        spark.createDataFrame([(r,) for r in rows], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    drop(["hot"] * 5 + ["warm"] * 3 + ["t1", "t2", "t3"])
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        drop(["hot"] * 4 + ["t4", "t5"])
        q.processAllAvailable()
    finally:
        q.stop()
    merged = {
        r.item: r
        for r in merge_topk(
            read_committed(spark, out), [], ["epoch"]
        ).collect()
    }
    exact = {"hot": 9, "warm": 3, "t1": 1, "t2": 1, "t3": 1, "t4": 1, "t5": 1}
    # k=2 keeps hot+warm in epoch 0 and hot+one tail in epoch 1; every
    # reported item's bounds must contain its true count
    assert "hot" in merged
    for item, r in merged.items():
        assert r.lb <= exact[item] <= r.ub
    assert merged["hot"].lb == 9  # hot made both epochs' top-2: exact
