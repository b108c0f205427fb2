"""Ordered event-sequence funnels (notebook-analytics depth, §2B/C15
adjunct): "how many users did A, then B after it, then C after that"
— the conversion-funnel question every product-analytics engine
answers (the reference's notebook slices single event types; ordered
multi-step sequences are its natural extension).

Semantics: stage i is reached at the EARLIEST event of the stage's
type at-or-after the previous stage's reach time (>= — a same-instant
follow-up counts, matching the sessionize/as-of boundary convention).
Events before the previous stage do not count (a click that precedes
the first view is not a conversion), and reach times are monotone by
construction, so stage counts are non-increasing.

Plan shape: chained conditional minima over ONE user-partitioned
window — each stage's min references the previous stage's column, so
Catalyst plans N Window passes over a single Exchange on the user
key; no self-joins, no per-stage scans (the classic SQL formulation
joins the events table once per stage). Asserted in
tests/test_sequencing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_reach_times(events: DataFrame, stages: list[str],
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts") -> DataFrame:
    """Per user: ``reach_<i>_<stage>`` timestamps (null = never
    reached), stage i conditional on reaching stage i-1 first."""
    if not stages:
        raise ValueError("need at least one stage")
    w = Window.partitionBy(user_col)
    df = events
    prev = None
    out_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (
                F.col(ts_col) >= F.col(prev)
            )
        name = f"reach_{i + 1}_{stage}"
        df = df.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
        out_cols.append(name)
    return df.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in out_cols]
    )


def sequence_funnel(events: DataFrame, stages: list[str],
                    user_col: str = "user_id",
                    type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Funnel report: one row per stage —
    ``(stage, n_users, conversion)`` where conversion is the fraction
    of stage-1 reachers who made it this far (1.0 for stage 1;
    null if nobody entered)."""
    reach = funnel_reach_times(events, stages, user_col, type_col, ts_col)
    cols = [c for c in reach.columns if c != user_col]
    counts = reach.agg(
        *[F.count(c).alias(f"__n{i}") for i, c in enumerate(cols)]
    )
    rows = [
        F.struct(
            F.lit(f"{i + 1}_{stage}").alias("stage"),
            F.col(f"__n{i}").alias("n_users"),
            (
                F.col(f"__n{i}").cast("double")
                / F.nullif(F.col("__n0").cast("double"), F.lit(0.0))
            ).alias("conversion"),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.stage", "r.n_users", "r.conversion"
    )


_PERIOD_DAYS = {"day": 1, "week": 7}


def retention_matrix(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     granularity: str = "week") -> DataFrame:
    """The classic retention triangle: cohort = the user's
    first-activity period (day/week), and cell
    ``(cohort, period_offset)`` counts that cohort's distinct users
    still active ``offset`` periods later. Offset 0 is the cohort size
    itself, so each row divides by its cohort's offset-0 count to give
    the retention curve.

    Plan: one user-partitioned window min for the cohort (1 exchange
    on the user key) feeding one distinct-count aggregate on
    (cohort, offset) (1 exchange) — no self-joins, no per-period
    scans."""
    if granularity not in _PERIOD_DAYS:
        raise ValueError(
            f"granularity must be one of {sorted(_PERIOD_DAYS)}, "
            f"got {granularity!r}"
        )
    days = _PERIOD_DAYS[granularity]
    period = F.date_trunc(granularity, F.col(ts_col))
    w = Window.partitionBy(user_col)
    df = events.select(
        user_col,
        period.alias("__p"),
    ).withColumn("__c", F.min("__p").over(w))
    offset = (
        F.datediff(F.col("__p"), F.col("__c")) / days
    ).cast("int")
    return (
        df.select(user_col, F.col("__c").alias("cohort"), offset.alias(
            "period_offset"
        ))
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      order_cols: list[str] | None = None) -> DataFrame:
    """Markov-style transition counts: for each user's event stream in
    time order, count (from_type, to_type) adjacent pairs and the
    per-from probability — "what do users do right after X", the path
    question between single-event value_counts and full funnels.

    One lag over the user-partitioned window (deterministic tie-break
    via ``order_cols``, default event_id if present) and one count
    aggregate — linear, no collect of per-user sequences."""
    order = [F.asc(ts_col)] + [
        F.asc(c) for c in (
            order_cols
            if order_cols is not None
            else (["event_id"] if "event_id" in events.columns else [])
        )
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("__from", F.lag(type_col).over(w))
        .where(F.col("__from").isNotNull())
        .groupBy(
            F.col("__from").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(w_from)).alias("p"),
    )


def rolling_zscore(df: DataFrame, value_col: str, key_cols: list[str],
                   ts_col: str = "ts", lookback: int = 24,
                   threshold: float = 3.0,
                   order_cols: list[str] | None = None) -> DataFrame:
    """Rolling z-score anomaly flags on a metric stream: each row's
    value against the mean/stddev of the PREVIOUS ``lookback`` rows of
    its key (the row itself excluded — a spike must not mask itself by
    inflating its own baseline). Rows with fewer than 2 prior points
    carry a null verdict. A zero-variance baseline is handled
    explicitly: any deviation from a perfectly steady history IS the
    clearest anomaly (z undefined, flag true); matching it exactly is
    normal. The monitoring companion to profile_drift: drift compares
    snapshots, this watches a metric series in time order.

    One ROWS-framed window per key — a single exchange on the key
    columns; lookback bounds the frame so per-row state is O(1)."""
    if lookback < 2:
        raise ValueError(f"lookback must be >= 2, got {lookback}")
    order = [F.asc(ts_col)] + [F.asc(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(value_col).over(w)
    # sample stddev of the baseline window
    std = F.stddev(value_col).over(w)
    n_prior = F.count(value_col).over(w)
    z = F.when(
        (n_prior >= 2) & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    anomaly = (
        F.when((n_prior >= 2) & (std > 0), F.abs(z) > threshold)
        .when(
            (n_prior >= 2) & (std == 0),
            ~F.col(value_col).eqNullSafe(mean),
        )
    )
    return df.select(
        "*",
        z.alias("zscore"),
        anomaly.alias("is_anomaly"),
    )
