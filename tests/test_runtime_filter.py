"""Runtime bloom-filter injection: a selective dim predicate must be
probed in the fact scan BEFORE the shuffle (semi-join reduction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.runtime_filter import (
    demo_confs,
    has_runtime_bloom_filter,
    selective_fact_join,
)
from web3_flight_rpc_server_spark.sources import tables


def test_bloom_filter_injected_into_fact_scan(spark, sf_dir):
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    with demo_confs(spark):
        joined = selective_fact_join(li, orders, "l_orderkey", "o_orderkey")
        assert has_runtime_bloom_filter(joined), (
            "expected might_contain probe in optimized plan:\n"
            + joined._jdf.queryExecution().optimizedPlan().toString()[:2000]
        )
        # The filter is a pruning aid, not a semantics change: results
        # must equal the no-filter plan.
        n_filtered = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        n_plain = selective_fact_join(
            li, orders, "l_orderkey", "o_orderkey"
        ).count()
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    assert n_filtered == n_plain


def test_no_injection_when_broadcastable(spark, sf_dir):
    # With broadcast available the dim folds into a broadcast join and
    # no bloom filter is needed (broadcast already prunes at the probe).
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = selective_fact_join(li, orders, "l_orderkey", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert not has_runtime_bloom_filter(joined)
