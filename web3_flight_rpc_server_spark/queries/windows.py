"""Window-function / grouping-set / set-op queries (C3-C6) plus batch
sessionization (C15's batch twin).

Scale notes: window functions shuffle once on partitionBy keys and
sort within partitions — the same shape at any scale as long as a
single key's rows fit an executor (events-per-user does; a global
window with no partitionBy would not, and none is used here). Rollup
expands each input row into (levels+1) grouping-set rows BEFORE the
shuffle but after partial aggregation, so it stays one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import round4
from ..registry import query
from ..sources import tables


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class (C4 ranking
    window; deterministic via the orderkey tie-break)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           floor((sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) * 10000 + 0.5) / 10000 AS running_spend,
           lag(o_orderkey) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
           ) AS prev_orderkey
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per customer over order date (C4 analytic
    window with an explicit ROWS frame)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        round4(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT)      AS n,
           floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (C3): per (flag, status), per flag, grand
    total — one pass, one shuffle."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), round4(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')    AS orderstatus,
           coalesce(o_orderpriority, 'ALL')  AS orderpriority,
           CAST(count(*) AS BIGINT)          AS n,
           floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (C3)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), round4(F.sum("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@query(
    "q_union_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey < 5
    """,
)
def q_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (C6): UNION (distinct) then EXCEPT (distinct)."""
    cust = tables.load_table(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    near = cust.where(F.col("c_nationkey") < 5).select("c_custkey")
    return building.union(rich).distinct().subtract(near)


@query(
    "q_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start,
           event_type,
           CAST(count(*) AS BIGINT)            AS n,
           floor((sum(value)) * 10000 + 0.5) / 10000 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window x key (C14), batch twin of the streaming
    version in streaming/windows.py — F.window() produces the same
    epoch-aligned buckets the oracle's time_bucket does for
    hour-divisible widths."""
    ev = tables.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count("*").alias("n"),
            round4(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, value,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           floor((sum(value)) * 10000 + 0.5) / 10000 AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (C15's batch twin): 30-minute inactivity
    gap splits sessions; lag + running-sum window then aggregate.
    The streaming equivalent is session_window(ts, '30 minutes') in
    streaming/windows.py."""
    ev = tables.load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    gap_over = (F.col("ts") - prev_ts) > F.expr("INTERVAL '30' MINUTE")
    flagged = ev.withColumn(
        "new_sess", F.when(prev_ts.isNull() | gap_over, 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        round4(F.sum("value")).alias("session_value"),
    )
