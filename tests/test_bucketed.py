"""Bucketed-join verification: matched bucket specs must remove BOTH
shuffles from an equi-join (the fact-fact scale lever)."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.sources import tables
from web3_flight_rpc_server_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # saveAsTable writes into spark.sql.warehouse.dir (set at session
    # build; default ./spark-warehouse) backed by local Derby.
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders")
    write_bucketed(
        li.select("l_orderkey", "l_quantity", "l_extendedprice"),
        "li_bucketed", "l_orderkey", 8, sort_by="l_orderkey",
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_totalprice"),
        "ord_bucketed", "l_orderkey", 8, sort_by="l_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    joined = bucketed_join(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "matched bucket specs must not shuffle:\n" + plan[:1500]
    )
    # and it still computes the right thing
    n = joined.count()
    li = spark.table("li_bucketed").count()
    assert n == li  # every lineitem matches exactly one order


def test_unbucketed_baseline_does_shuffle(spark, sf_dir):
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders")
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(
            orders, li.l_orderkey == orders.o_orderkey, "inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
