"""Equivalence tests: the cogrouped-pandas as-of variant against the
window implementation, and salted aggregation against plain groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.asof import asof_join, asof_join_pandas
from web3_flight_rpc_server_spark.operators.skew import salted_agg
from web3_flight_rpc_server_spark.sources import tables


def test_asof_pandas_equals_window_variant(spark, sf_dir):
    ev = tables.load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")

    via_window = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["value"],
    ).select("event_id", "ts_right", "value_right")
    via_pandas = asof_join_pandas(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["value"],
    ).select("event_id", "ts_right", "value_right")

    w = {tuple(r) for r in via_window.collect()}
    p = {tuple(r) for r in via_pandas.collect()}
    assert w == p, f"diff: {list(w ^ p)[:4]}"


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    ev = tables.load_table(spark, sf_dir, "events")
    # manufacture skew: one hot key holding most rows
    skewed = ev.withColumn(
        "key", F.when(F.col("event_id") % 10 != 0, "HOT").otherwise(
            F.col("event_type"))
    )
    salted = salted_agg(
        skewed, ["key"], n_salts=16, sums=["value"], mins=["value"], maxs=["value"]
    )
    plain = skewed.groupBy("key").agg(
        F.count("*").alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    s = {(r.key, r.n_rows, round(r.sum_value, 4), r.min_value, r.max_value)
         for r in salted.collect()}
    p = {(r.key, r.n_rows, round(r.sum_value, 4), r.min_value, r.max_value)
         for r in plain.collect()}
    assert s == p


def test_salted_agg_splits_hot_key(spark, sf_dir):
    """Phase-1 must actually split the hot key across salts."""
    ev = tables.load_table(spark, sf_dir, "events")
    skewed = ev.withColumn("key", F.lit("HOT"))
    from pyspark.sql import functions as FF

    salt = FF.pmod(FF.xxhash64(*[FF.col(c) for c in skewed.columns]), FF.lit(16))
    n_groups = (
        skewed.withColumn("__salt", salt)
        .groupBy("key", "__salt").count().count()
    )
    assert n_groups > 8, "hot key should spread over most salts"
