"""Scalar / derived-column queries (notebook §2B + extended C7/C8).

- array element extraction with empty-guard (cell 10:
  topics.apply(lambda x: x[0] if len(x) > 0 else None))
- static map lookup with default (cell 10: map(EVENT_SIGNATURES)
  .fillna('Unknown'))
- derived arithmetic (cell 18: gasUsed/gasLimit*100)
- array length (cell 20: transactions.apply(len))
- epoch->timestamp conversion (cell 22: pd.to_datetime(unit='s'))
- JSON extraction (C8; events.props carries a JSON payload)

All stay JVM-side (built-in functions inside whole-stage codegen) —
no Python in the hot path. ANSI mode note: Spark 4 runs ANSI SQL, so
out-of-bounds array / missing map access uses try_element_at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..registry import query
from ..sources import tables


@query(
    "q_array_extract",
    oracle="""
    SELECT vec_id, floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_dim
    FROM embeddings
    """,
)
def q_array_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First array element with null-on-empty guard (notebook cell 10
    topic0 extraction). try_element_at == the lambda's len()>0 guard."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        round4(F.try_element_at("embedding", F.lit(1)).cast("double")).alias(
            "first_dim"
        ),
    )


@query(
    "q_map_lookup",
    oracle="""
    SELECT event_id,
           CASE event_type
             WHEN 'click'    THEN 'Click'
             WHEN 'purchase' THEN 'Purchase'
             WHEN 'view'     THEN 'View'
             ELSE 'Unknown'
           END AS event_name
    FROM events
    """,
)
def q_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static map lookup with a default (notebook cell 10:
    .map(EVENT_SIGNATURES).fillna('Unknown')). Implemented as a literal
    create_map + coalesce so the lookup is a codegen'd expression, not
    a join."""
    ev = tables.load_table(spark, sf_dir, "events")
    mapping = F.create_map(
        F.lit("click"), F.lit("Click"),
        F.lit("purchase"), F.lit("Purchase"),
        F.lit("view"), F.lit("View"),
    )
    return ev.select(
        "event_id",
        F.coalesce(
            F.try_element_at(mapping, F.col("event_type")), F.lit("Unknown")
        ).alias("event_name"),
    )


@query(
    "q_derived_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) / 10000 AS charge,
           floor((100.0 * l_discount) * 10000 + 0.5) / 10000 AS discount_pct
    FROM lineitem
    """,
)
def q_derived_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (notebook cell 18:
    gas_utilization = gasUsed/gasLimit*100)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round4(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        round4(F.lit(100.0) * F.col("l_discount")).alias("discount_pct"),
    )


@query(
    "q_array_length",
    oracle="""
    SELECT vec_id, len(embedding) AS dim
    FROM embeddings
    """,
)
def q_array_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array length (notebook cell 20: transactions.apply(len))."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.size("embedding").cast("long").alias("dim"))


@query(
    "q_timestamp_convert",
    oracle="""
    SELECT date_trunc('hour', ts)     AS hour_ts,
           CAST(count(*) AS BIGINT)   AS n,
           floor((sum(value)) * 10000 + 0.5) / 10000       AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_timestamp_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp bucketing after epoch->timestamp conversion (notebook
    cell 22: pd.to_datetime(timestamp, unit='s'); the ns->µs ingest
    conversion itself lives in sources/tables.py)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(
            F.count("*").alias("n"),
            round4(F.sum("value")).alias("total_value"),
        )
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string payload column (C8; the
    reference parses JSON tickets, Producer.java:40-51)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
