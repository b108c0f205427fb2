"""Window-function / grouping-set queries (C3-C4, C14) plus batch
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
    "q_window_funcs",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_custkey, o_orderdate,
           o_totalprice,
           CAST(rk AS BIGINT) AS rk,
           running_spend,
           prev_orderkey
    FROM (
        SELECT o_orderpriority, o_orderkey, o_custkey, o_orderdate,
               o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rk,
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
    )
    WHERE rk <= 3
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 window functions in one pass: ranking (top-3 orders by price
    per priority class, deterministic via the orderkey tie-break) plus
    analytic functions over a second partitioning (running customer
    spend with an explicit ROWS frame, and lag). The running columns
    are computed over ALL rows, then the rank filter applies — so the
    surviving rows carry their true per-customer history. Two window
    specs -> two exchanges; each partitions on a bounded key."""
    orders = tables.load_table(spark, sf_dir, "orders")
    w_rank = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_cust = W.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "o_totalprice",
            F.row_number().over(w_rank).cast("long").alias("rk"),
            round4(
                F.sum("o_totalprice").over(
                    w_cust.rowsBetween(W.unboundedPreceding, W.currentRow)
                )
            ).alias("running_spend"),
            F.lag("o_orderkey").over(w_cust).alias("prev_orderkey"),
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "q_rollup_cube",
    oracle="""
    SELECT 'rollup' AS src,
           coalesce(l_returnflag, 'ALL') AS k1,
           coalesce(l_linestatus, 'ALL') AS k2,
           CAST(count(*) AS BIGINT)      AS n,
           floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS metric
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS src,
           coalesce(o_orderstatus, 'ALL')    AS k1,
           coalesce(o_orderpriority, 'ALL')  AS k2,
           CAST(count(*) AS BIGINT)          AS n,
           floor((sum(o_totalprice)) * 10000 + 0.5) / 10000 AS metric
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    declared=False,
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3's two grouping-set specializations, tagged in one result:
    hierarchical ROLLUP over lineitem (per (flag, status), per flag,
    grand total) and full CUBE over orders. Each leg is one scan and
    one expand+shuffle; the union is free (no exchange of its own).

    Undeclared since round 4: C3 stays driver-attested through
    q_grouping_sets (the general form rollup/cube specialize) and
    q_time_rollup's grouping sets, so this slot was ceded to
    q_sketch_rollup — rollup/cube semantics remain oracle-checked here
    via tests/test_oracle_parity.py and plan-asserted in
    tests/test_plans.py."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders")
    rollup_leg = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), round4(F.sum("l_quantity")).alias("metric"))
        .select(
            F.lit("rollup").alias("src"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("k1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("k2"),
            "n",
            "metric",
        )
    )
    cube_leg = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), round4(F.sum("o_totalprice")).alias("metric"))
        .select(
            F.lit("cube").alias("src"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "n",
            "metric",
        )
    )
    return rollup_leg.unionByName(cube_leg)


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
    hour-divisible widths. Also covers B15 (epoch->timestamp
    conversion followed by time bucketing): the ns->us ingest
    conversion lives in sources/tables.py and ts arrives here as a
    proper TIMESTAMP, the notebook's pd.to_datetime(unit='s')."""
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


@query(
    "q_user_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS r1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS r2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.r1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS r3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.r2
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users,
           floor((CAST((SELECT count(*) FROM s1) AS DOUBLE)
                  / (SELECT count(*) FROM s1)) * 10000 + 0.5) / 10000 AS conversion
    UNION ALL
    SELECT '2_click', CAST((SELECT count(*) FROM s2) AS BIGINT),
           floor((CAST((SELECT count(*) FROM s2) AS DOUBLE)
                  / (SELECT count(*) FROM s1)) * 10000 + 0.5) / 10000
    UNION ALL
    SELECT '3_purchase', CAST((SELECT count(*) FROM s3) AS BIGINT),
           floor((CAST((SELECT count(*) FROM s3) AS DOUBLE)
                  / (SELECT count(*) FROM s1)) * 10000 + 0.5) / 10000
    """,
)
def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase
    (operators/sequencing.py): per-stage user counts where each stage
    must follow the previous one in event time. The Spark plan is N
    chained window minima over ONE user-key exchange; the oracle is
    the classic SQL formulation that re-joins the events table per
    stage — same numbers, structurally different plans, which is
    exactly what makes the cross-engine check meaningful. Declared in
    r5 (rotated in for the behavior-analytics layer);
    boundary/ordering semantics pinned in tests/test_sequencing.py."""
    from ..functions import round4
    from ..operators.sequencing import sequence_funnel

    ev = tables.load_table(spark, sf_dir, "events")
    out = sequence_funnel(ev, ["view", "click", "purchase"])
    return out.select(
        "stage", "n_users", round4(F.col("conversion")).alias("conversion")
    )


@query(
    "q_retention",
    declared=False,
    oracle="""
    WITH per AS (
        SELECT user_id,
               date_trunc('week', ts) AS p,
               min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS c
        FROM events
    )
    SELECT c AS cohort,
           CAST(date_diff('day', c, p) / 7 AS INTEGER) AS period_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM per
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (operators/sequencing.py): cohort =
    first-activity week, cells = distinct users active N weeks later —
    the notebook-analytics staple the reference's per-slice
    value_counts can't express. One window pass + one distinct-count
    aggregate; the oracle recomputes both cross-engine. Declared in r7
    (rotated in for q_filter_case_insensitive); undeclared since r14 —
    its slot went to q_langid, C15 stays attested by q_sessionize +
    q_user_funnel and this oracle keeps running in
    tests/test_oracle_parity.py's whole-registry parametrize."""
    from ..operators.sequencing import retention_matrix

    ev = tables.load_table(spark, sf_dir, "events")
    return retention_matrix(ev, granularity="week")


@query(
    "q_transitions",
    declared=False,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS from_type
        FROM events
    ),
    pairs AS (
        SELECT from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           floor((CAST(n AS DOUBLE)
                  / sum(n) OVER (PARTITION BY from_type)) * 10000 + 0.5)
               / 10000 AS p
    FROM pairs
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event transition matrix (operators/sequencing.py): per-user
    time-ordered adjacent (from, to) event-type pairs with
    per-from-state probabilities — linear lag+count, no sequence
    collection. Declared in r7 (rotated in for q_top1); undeclared
    since r14 — its slot went to q_containment_blocked, C15 stays
    attested by q_sessionize + q_user_funnel and this oracle keeps
    running in tests/test_oracle_parity.py."""
    from ..operators.sequencing import transition_matrix

    ev = tables.load_table(spark, sf_dir, "events")
    out = transition_matrix(ev)
    return out.select(
        "from_type", "to_type", "n", round4(F.col("p")).alias("p")
    )


@query(
    "q_zscore",
    oracle="""
    WITH w AS (
        SELECT event_id, value,
               avg(value)         OVER win AS m,
               stddev_samp(value) OVER win AS s,
               count(value)       OVER win AS np
        FROM events
        WINDOW win AS (
            PARTITION BY event_type ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id,
           CASE WHEN np >= 2 AND s > 0
                THEN floor(((value - m) / s) * 10000 + 0.5) / 10000
           END AS zscore,
           CAST(CASE WHEN np >= 2 AND s > 0 THEN abs((value - m) / s) > 3.0
                     WHEN np >= 2 AND s = 0 THEN value IS DISTINCT FROM m
                END AS BIGINT) AS is_anomaly
    FROM w
    """,
    declared=False,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags (operators/sequencing.py) on the
    event value stream per type: each value against the mean/stddev of
    its previous 24 same-type values (self-excluded), zero-variance
    deviations flagged explicitly. Undeclared — the driver window is
    full; spike/baseline semantics pinned in tests/test_sequencing.py."""
    from ..operators.sequencing import rolling_zscore

    ev = tables.load_table(spark, sf_dir, "events")
    out = rolling_zscore(
        ev, "value", ["event_type"], lookback=24, threshold=3.0,
        order_cols=["event_id"],
    )
    # nullable booleans normalize differently across the engines'
    # pandas bridges (None vs NaN); a nullable BIGINT does not
    return out.select(
        "event_id",
        round4(F.col("zscore")).alias("zscore"),
        F.col("is_anomaly").cast("long").alias("is_anomaly"),
    )
