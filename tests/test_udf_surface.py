"""C18 UDAF/UDTF legs: grouped-agg pandas UDAF and Python UDTF."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.queries.udfs import (
    geometric_mean_udaf,
    make_props_udtf,
)
from web3_flight_rpc_server_spark.sources import tables


def test_geometric_mean_udaf_matches_exact(spark, sf_dir):
    ev = tables.load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    got = {
        r.event_type: r.gm
        for r in ev.groupBy("event_type")
        .agg(geometric_mean_udaf()("value").alias("gm"))
        .collect()
    }
    rows = ev.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        exact = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert abs(got[et] - exact) < 1e-9, et


def test_props_udtf_explodes_json_kv(spark, sf_dir):
    spark.udtf.register("props_kv", make_props_udtf())
    ev = tables.load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_udtf")
    got = spark.sql(
        """
        SELECT e.event_id, t.key, t.value
        FROM ev_udtf e, LATERAL props_kv(e.props) t
        WHERE e.event_id < 50
        """
    ).collect()
    raw = {
        r.event_id: json.loads(r.props)
        for r in ev.where("event_id < 50").select("event_id", "props").collect()
        if r.props is not None
    }
    expect = {
        (eid, str(k), str(v))
        for eid, obj in raw.items()
        if isinstance(obj, dict)
        for k, v in obj.items()
    }
    assert {(r.event_id, r.key, r.value) for r in got} == expect
    assert expect, "fixture props must produce rows"
