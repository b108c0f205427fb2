"""Join queries (notebook B14 + extended C1/C2).

- left equi-join   (notebook cell 22: logs.merge(blocks, how='left'))
- semi / anti      (C1)
- range/theta join (C2: band join on an inequality)
- as-of join       (C2: operators/asof.py; DuckDB ASOF JOIN is the oracle)

Scale notes: the dimension side is broadcast in every query here
(customer/bands are small); the fact side never shuffles for the
broadcast joins. The as-of join costs one hash-shuffle on its key.
At 100 TB: fact-fact equi-joins become sort-merge on the join key —
pre-bucketing both sides on the key (bucketBy at write) removes that
shuffle; AQE's skew-join splitting handles hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..operators import asof_join
from ..registry import query
from ..sources import tables


@query(
    "q_join_left",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join fact->dim (notebook cell 22). The dim side is
    explicitly broadcast: no shuffle of the fact table."""
    ev = tables.load_table(spark, sf_dir, "events")
    cust = tables.load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select("event_id", "user_id", "c_name", "c_mktsegment")
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_order' AS tag
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, 'no_order' AS tag
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi- and anti-join (EXISTS / NOT EXISTS) in one result, tagged."""
    cust = tables.load_table(spark, sf_dir, "customer")
    orders = tables.load_table(spark, sf_dir, "orders")
    okeys = orders.select("o_custkey")
    semi = (
        cust.join(okeys, cust.c_custkey == okeys.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.lit("has_order").alias("tag"))
    )
    anti = (
        cust.join(okeys, cust.c_custkey == okeys.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.lit("no_order").alias("tag"))
    )
    return semi.unionByName(anti)


@query(
    "q_join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('negative', -100000.0, 0.0),
               ('low',      0.0,       3000.0),
               ('mid',      3000.0,    7000.0),
               ('high',     7000.0,    100000.0)
    )
    SELECT b.band,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor((sum(c.c_acctbal)) * 10000 + 0.5) / 10000 AS total_bal
    FROM customer c
    JOIN bands b ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
    GROUP BY b.band
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a banding dimension. The bands table
    is tiny -> broadcast nested-loop, evaluated as a codegen'd
    predicate per row; no shuffle of the probe side."""
    cust = tables.load_table(spark, sf_dir, "customer")
    bands = spark.createDataFrame(
        [
            ("negative", -100000.0, 0.0),
            ("low", 0.0, 3000.0),
            ("mid", 3000.0, 7000.0),
            ("high", 7000.0, 100000.0),
        ],
        "band string, lo double, hi double",
    )
    return (
        cust.join(
            F.broadcast(bands),
            (cust.c_acctbal >= bands.lo) & (cust.c_acctbal < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_customers"),
            round4(F.sum("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           c.ts    AS ts_right,
           c.value AS value_right
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's latest click at or
    before the purchase time (operators/asof.py; oracle = DuckDB's
    native ASOF LEFT JOIN)."""
    ev = tables.load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["value"],
    )
    return joined.select("event_id", "user_id", "ts", "ts_right", "value_right")
