"""Ordered event-sequence funnels (operators/sequencing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.sequencing import (
    funnel_reach_times,
    sequence_funnel,
)

SCHEMA = "user_id long, event_type string, ts long"


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: clean conversion view(10) -> click(20) -> purchase(30)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view must not count; no click after -> stops
        (2, "click", 5), (2, "view", 10), (2, "purchase", 50),
        # u3: same-instant follow-up counts (>= boundary)
        (3, "view", 10), (3, "click", 10), (3, "purchase", 10),
        # u4: never viewed -> enters no stage
        (4, "click", 10), (4, "purchase", 20),
        # u5: converts using the SECOND click (first predates the view)
        (5, "click", 1), (5, "view", 5), (5, "click", 9), (5, "purchase", 11),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_reach_times_respect_order_and_boundary(events):
    r = {
        x.user_id: x
        for x in funnel_reach_times(
            events, ["view", "click", "purchase"]
        ).collect()
    }
    assert (r[1].reach_1_view, r[1].reach_2_click, r[1].reach_3_purchase) == (
        10, 20, 30
    )
    assert r[2].reach_2_click is None and r[2].reach_3_purchase is None
    assert (r[3].reach_2_click, r[3].reach_3_purchase) == (10, 10)
    assert r[4].reach_1_view is None
    assert (r[5].reach_2_click, r[5].reach_3_purchase) == (9, 11)


def test_funnel_counts_monotone_and_conversions(events):
    rows = {r.stage: r for r in sequence_funnel(
        events, ["view", "click", "purchase"]
    ).collect()}
    assert rows["1_view"].n_users == 4       # u1, u2, u3, u5
    assert rows["2_click"].n_users == 3      # u1, u3, u5
    assert rows["3_purchase"].n_users == 3
    assert rows["1_view"].conversion == 1.0
    assert abs(rows["2_click"].conversion - 0.75) < 1e-9


def test_single_exchange_plan(events):
    """N chained stage minima must plan as Window passes over ONE
    user-key Exchange — never a join or scan per stage."""
    reach = funnel_reach_times(events, ["view", "click", "purchase"])
    plan = reach._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_empty_stages_refused(events):
    with pytest.raises(ValueError, match="stage"):
        funnel_reach_times(events, [])


def test_retention_matrix_cohorts_and_offsets(spark):
    from web3_flight_rpc_server_spark.operators.sequencing import (
        retention_matrix,
    )

    # week granularity; 2024-01-01 is a Monday
    rows = [
        # u1: cohort W0, active W0 and W2 (twice in W2 -> still 1 user)
        (1, "2024-01-01 10:00:00"), (1, "2024-01-15 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        # u2: cohort W0, active W0 only
        (2, "2024-01-03 09:00:00"),
        # u3: cohort W1, active W1 and W2
        (3, "2024-01-08 09:00:00"), (3, "2024-01-18 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (r.cohort.date().isoformat(), r.period_offset): r.n_users
        for r in retention_matrix(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_retention_granularity_validated(spark):
    from web3_flight_rpc_server_spark.operators.sequencing import (
        retention_matrix,
    )

    with pytest.raises(ValueError, match="granularity"):
        retention_matrix(spark.range(1), granularity="month")


def test_transition_matrix_counts_and_probabilities(spark):
    from web3_flight_rpc_server_spark.operators.sequencing import (
        transition_matrix,
    )

    rows = [
        (1, "view", 1), (1, "click", 2), (1, "view", 3), (1, "click", 4),
        (2, "view", 1), (2, "error", 2),
        (3, "click", 9),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.from_type, r.to_type): (r.n, round(r.p, 6))
        for r in transition_matrix(df).collect()
    }
    assert got == {
        ("view", "click"): (2, round(2 / 3, 6)),
        ("view", "error"): (1, round(1 / 3, 6)),
        ("click", "view"): (1, 1.0),
    }
    # probabilities sum to 1 per from-state
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-6 for s in sums.values())


def test_rolling_zscore_flags_spike_not_baseline(spark):
    from web3_flight_rpc_server_spark.operators.sequencing import (
        rolling_zscore,
    )

    # steady 10s with one 100 spike; key 'b' is constant (zero
    # variance -> no verdict, never a flag)
    rows = [("a", t, 10.0) for t in range(1, 9)] + [
        ("a", 9, 100.0), ("a", 10, 10.0)
    ] + [("b", t, 5.0) for t in range(1, 6)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {
        (r.k, r.ts): r
        for r in rolling_zscore(
            df, "v", ["k"], lookback=5, threshold=3.0
        ).collect()
    }
    # the spike deviates from a ZERO-VARIANCE steady baseline: z is
    # undefined but the verdict is the clearest possible anomaly
    assert out[("a", 9)].zscore is None
    assert out[("a", 9)].is_anomaly is True
    # earlier steady rows match their steady baseline exactly: normal
    assert out[("a", 5)].zscore is None
    assert out[("a", 5)].is_anomaly is False
    # the row AFTER the spike is judged against a baseline that now
    # contains the spike -> inflated stddev, real z, no flag
    assert out[("a", 10)].zscore is not None
    assert out[("a", 10)].is_anomaly is False
    # first rows lack >= 2 priors: no verdict
    assert out[("a", 1)].zscore is None and out[("a", 1)].is_anomaly is None
    assert all(out[("b", t)].is_anomaly in (False, None) for t in range(1, 6))


def test_rolling_zscore_lookback_validated(spark):
    from web3_flight_rpc_server_spark.operators.sequencing import (
        rolling_zscore,
    )

    with pytest.raises(ValueError, match="lookback"):
        rolling_zscore(spark.range(1), "id", [], lookback=1)
