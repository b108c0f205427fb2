"""Grouping-sets / set-op completion queries (C3/C6) and the composite
text-pipeline query (C13 end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..functions.text import STOPWORDS, stopword_hits, tokens
from ..registry import query
from ..sources import tables


@query(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           CAST(count(*) AS BIGINT)       AS n,
           floor((sum(l_extendedprice)) * 10000 + 0.5) / 10000 AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    declared=False,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by flag only, by status only, grand
    total) — the general form rollup/cube specialize (C3).

    Undeclared since r11 (slot ceded to the q_media_replay/q_bpe_pairs
    rotation; C3 stays driver-attested by q_time_rollup's grouping-sets
    plan, and this query stays oracle-checked at sf0.001 in
    tests/test_oracle_parity.py)."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
               coalesce(l_linestatus, 'ALL')  AS linestatus,
               count(*)                       AS n,
               floor((sum(l_extendedprice)) * 10000 + 0.5) / 10000 AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_intersect_except_all",
    oracle="""
    SELECT c_custkey, 'both_segments_overlap' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 1000
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    )
    UNION ALL
    SELECT l_orderkey AS c_custkey, 'dup_surviving' AS tag FROM (
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1
    )
    UNION ALL
    SELECT c_custkey, 'union_except' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_nationkey < 5
    )
    """,
)
def q_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full C6 set-operation surface in one tagged result:
    INTERSECT (distinct), EXCEPT ALL (multiset difference — orders
    keep one surviving row per extra lineitem), and a UNION (distinct)
    -> EXCEPT (distinct) chain. Each leg is an independent shuffle on
    its own key; the tagged UNION ALL adds no exchange."""
    cust = tables.load_table(spark, sf_dir, "customer")
    li = tables.load_table(spark, sf_dir, "lineitem")
    both = (
        cust.where(F.col("c_acctbal") > 1000).select("c_custkey")
        .intersect(
            cust.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select("c_custkey")
        )
        .select("c_custkey", F.lit("both_segments_overlap").alias("tag"))
    )
    dup = (
        li.where(F.col("l_linenumber") <= 2).select("l_orderkey")
        .exceptAll(li.where(F.col("l_linenumber") == 1).select("l_orderkey"))
        .select(F.col("l_orderkey").alias("c_custkey"), F.lit("dup_surviving").alias("tag"))
    )
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    near = cust.where(F.col("c_nationkey") < 5).select("c_custkey")
    ue = (
        building.union(rich).distinct().subtract(near)
        .select("c_custkey", F.lit("union_except").alias("tag"))
    )
    return both.unionByName(dup).unionByName(ue)


@query(
    "q_sliding_window",
    oracle="""
    WITH expanded AS (
        SELECT e.*,
               time_bucket(INTERVAL '2 hours', e.ts) - to_hours(2 * k.k) AS win_start
        FROM events e, UNNEST(range(0, 3)) AS k(k)
    )
    SELECT win_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(value)) * 10000 + 0.5) / 10000 AS total_value
    FROM expanded
    WHERE ts < win_start + INTERVAL '6 hours' AND ts >= win_start
    GROUP BY 1, 2
    """,
    # ceded from the declared window in r5 (C14 stays attested by
    # q_tumbling_window); still oracle-checked by
    # tests/test_oracle_parity.py's whole-registry parametrize
    declared=False,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (6h width, 2h slide): every event lands in 3
    overlapping windows (C14's overlapping batch twin; the oracle
    expands each row into its 3 candidate windows by hand)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "2 hours"), "event_type")
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


def _pipeline_oracle() -> str:
    toks = "string_split(lower(text), ' ')"
    en_hits = (
        "len(list_filter({t}, x -> x IN ({w})))".format(
            t=toks, w=", ".join(f"'{w}'" for w in STOPWORDS["en"])
        )
    )
    return f"""
    WITH scored AS (
        SELECT doc_id, text,
               CAST(len({toks}) AS DOUBLE) AS n_tokens,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS n_uniq,
               {en_hits} AS en_hits
        FROM documents
        WHERE lang = 'en' AND n_chars >= 100
    ),
    quality AS (
        SELECT doc_id, text FROM scored
        WHERE n_uniq / n_tokens >= 0.3 AND n_tokens >= 20
    ),
    deduped AS (
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
        FROM quality GROUP BY text
    )
    SELECT keep_id,
           CAST(n_copies AS BIGINT) AS n_copies,
           md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fingerprint
    FROM deduped
    """


@query("q_text_pipeline", oracle=_pipeline_oracle(), declared=False)
def q_text_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undeclared since round 2: subsumed by q_curation_funnel (the
    full funnel with per-doc routing oracle); stays bench/pytest-run.

    The training-data pipeline end to end in ONE plan: language +
    length gate -> quality gate (lexical diversity, token floor) ->
    exact dedup keeping min id -> bag-of-words fingerprint. All gates
    are scan-level predicates (pushed) followed by one hash shuffle on
    the content key."""
    docs = tables.load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    quality = (
        docs.where((F.col("lang") == "en") & (F.col("n_chars") >= 100))
        .where((n_uniq / n_tokens >= 0.3) & (n_tokens >= 20))
    )
    deduped = quality.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    )
    return deduped.select(
        "keep_id",
        "n_copies",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens("text"))))
        ).alias("fingerprint"),
    )


@query(
    "q_time_rollup",
    oracle="""
    SELECT CASE WHEN grouping(date_trunc('hour', ts)) = 0 THEN 'hour'
                WHEN grouping(date_trunc('day', ts))  = 0 THEN 'day'
                ELSE 'all' END                       AS level,
           date_trunc('day', ts)                     AS day_ts,
           date_trunc('hour', ts)                    AS hour_ts,
           CAST(count(*) AS BIGINT)                  AS n,
           floor(sum(value) * 10000 + 0.5) / 10000   AS total_value
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)), ())
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: hourly, daily,
    and grand-total aggregates of the event stream in ONE scan and one
    expand+shuffle (GROUPING SETS), instead of three passes. This is
    the batch twin of a continuous-aggregate hierarchy: at 100 TB the
    hourly level is the materialized base and the daily/total levels
    re-aggregate from it; expressing all levels in one statement keeps
    them consistent by construction."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN grouping(date_trunc('hour', ts)) = 0 THEN 'hour'
                    WHEN grouping(date_trunc('day', ts))  = 0 THEN 'day'
                    ELSE 'all' END                       AS level,
               date_trunc('day', ts)                     AS day_ts,
               date_trunc('hour', ts)                    AS hour_ts,
               count(*)                                  AS n,
               floor(sum(value) * 10000 + 0.5) / 10000   AS total_value
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                                (date_trunc('day', ts)), ())
        """
    )
