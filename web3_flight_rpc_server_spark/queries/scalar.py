"""Scalar / derived-column queries (notebook §2B + extended C7/C8).

- array element extraction with empty-guard (cell 10:
  topics.apply(lambda x: x[0] if len(x) > 0 else None)) and array
  length (cell 20: transactions.apply(len)) — one embeddings pass
- static map lookup with default (cell 10: map(EVENT_SIGNATURES)
  .fillna('Unknown')) and JSON extraction (C8; events.props carries a
  JSON payload) — one events pass

Derived arithmetic (cell 18) rides q_scan_project; epoch->timestamp
bucketing (cell 22) rides q_tumbling_window — each folded into the
query already scanning its table, keeping the registry inside the
driver's CORRECTNESS window without losing oracle coverage.

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
    SELECT vec_id,
           floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_dim,
           len(embedding) AS dim
    FROM embeddings
    """,
    declared=False,
)
def q_array_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalars in one embeddings pass: first element with
    null-on-empty guard (notebook cell 10 topic0 extraction;
    try_element_at == the lambda's len()>0 guard) and array length
    (cell 20: transactions.apply(len)). Undeclared since r6 (slot
    ceded to the serving/mixture rotation): B6/B12 stay driver-
    attested inside q_scan_project/q_topic0_filter, and this query
    remains oracle-checked by tests/test_oracle_parity.py."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        round4(F.try_element_at("embedding", F.lit(1)).cast("double")).alias(
            "first_dim"
        ),
        F.size("embedding").cast("long").alias("dim"),
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
           END AS event_name,
           CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    """,
)
def q_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event scalar enrichment in one pass: static map lookup with
    a default (notebook cell 10: .map(EVENT_SIGNATURES)
    .fillna('Unknown') — a literal create_map + coalesce, a codegen'd
    expression rather than a join) and JSON field extraction from the
    props string payload (C8; the reference parses JSON tickets,
    Producer.java:40-51)."""
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
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
