"""Ordered event-sequence funnels (operators/sequencing.py)."""

from __future__ import annotations

import pytest

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
