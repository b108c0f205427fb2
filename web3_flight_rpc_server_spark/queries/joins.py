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
from ..functions.localdf import local_df


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
    declared=False,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a banding dimension. The bands table
    is tiny -> broadcast nested-loop, evaluated as a codegen'd
    predicate per row; no shuffle of the probe side. Undeclared since
    r6 (slot ceded to the serving/mixture rotation): C2 stays
    driver-attested by q_join_asof, the join shape is plan-asserted,
    and this query remains oracle-checked by
    tests/test_oracle_parity.py."""
    cust = tables.load_table(spark, sf_dir, "customer")
    bands = local_df(
        spark,
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


@query(
    "q_multi_join",
    oracle="""
    SELECT n.n_name,
           floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5)
               / 10000 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey  = o.o_orderkey
    JOIN customer c ON o.o_custkey   = c.c_custkey
    JOIN supplier s ON l.l_suppkey   = s.s_suppkey
    JOIN nation   n ON s.s_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: local-supplier revenue per
    nation of one region over a date window. The snowflake
    (region->nation->supplier) collapses into broadcasts so the
    lineitem fact never shuffles for them; orders/customer are
    broadcast at test scale and become sort-merge (or bucketed
    co-located, sources/bucketed.py) joins at 100 TB. Catalyst pushes
    the region filter through the chain and prunes every scan to the
    joined/aggregated columns."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = tables.load_table(spark, sf_dir, "customer")
    supp = tables.load_table(spark, sf_dir, "supplier")
    nation = tables.load_table(spark, sf_dir, "nation")
    region = tables.load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    # snowflake dims fold into one broadcast relation
    supp_geo = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    joined = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_geo), li.l_suppkey == supp_geo.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (F.col("s_nationkey") == cust.c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        round4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_promo_share",
    oracle="""
    SELECT p.p_brand,
           floor(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END) * 10000 + 0.5) / 10000 AS promo_revenue,
           floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5)
               / 10000 AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    declared=False,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo-revenue breakdown per brand: conditional
    aggregation over a broadcast fact->part join (part is a classic
    broadcastable dim even at 100 TB: ~200M rows x narrow projection
    still beats shuffling the fact table when memory allows; otherwise
    it degrades to one sort-merge shuffle on l_partkey). Undeclared
    since r6 (slot ceded to the serving/mixture rotation): C21 stays
    driver-attested by q_multi_join (all-broadcast, plan-asserted),
    and this query remains oracle-checked by
    tests/test_oracle_parity.py."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    part = tables.load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            round4(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
            ).alias("promo_revenue"),
            round4(F.sum(rev)).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )
