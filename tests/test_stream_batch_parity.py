"""Stream-batch unification: the streaming window builders accept a
batch DataFrame (same code path) and must produce the same answers as
the declared batch queries — Spark's core unification promise, tested
rather than assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.registry import all_queries
from web3_flight_rpc_server_spark.sources import tables
from web3_flight_rpc_server_spark.streaming.windows import tumbling_agg


def test_tumbling_builder_on_batch_equals_declared_query(spark, sf_dir):
    ev = tables.load_table(spark, sf_dir, "events")
    # the builder's watermark is a no-op on batch input
    via_builder = {
        (r.win_start, r.event_type, r.n, r.total_value)
        for r in tumbling_agg(ev, width="6 hours").collect()
    }
    q = all_queries()["q_tumbling_window"]
    via_query = {
        (r.win_start, r.event_type, r.n, r.total_value)
        for r in q.fn(spark, sf_dir).collect()
    }
    assert via_builder == via_query
