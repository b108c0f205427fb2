"""One-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [
            (1, 9.5, "b", None),
            (2, 10.0, "a", "x"),
            (3, None, "a", "x"),
            (4, 2.0, None, "x"),
        ],
        "id long, score double, tag string, opt string",
    )


def test_stats_correct_on_constructed_table(sample):
    rows = {r.column: r for r in profile_table(sample, exact_distinct=True).collect()}
    assert set(rows) == {"id", "score", "tag", "opt"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert (rows["opt"].n_nulls, rows["opt"].n_distinct) == (1, 1)
    assert rows["opt"].null_frac == 0.25
    assert (rows["tag"].n_nulls, rows["tag"].n_distinct) == (1, 2)
    assert rows["id"].n_nulls == 0 and rows["id"].n_distinct == 4
    assert rows["id"].dtype == "bigint"


def test_min_max_ordered_on_native_type_not_lexicographic(sample):
    """9.5 < 10.0 numerically but '10.0' < '9.5' lexicographically —
    min/max must be taken before the string cast."""
    r = {x.column: x for x in profile_table(sample).collect()}["score"]
    assert (r.min_value, r.max_value) == ("2.0", "10.0")


def test_approx_tier_is_single_pass_no_expand(sample):
    plan = (
        profile_table(sample)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, "approx profile must not multiply rows"
    assert plan.count("Exchange") == 1  # global agg: partial -> single


def test_exact_tier_pays_expand_and_says_so(sample):
    plan = (
        profile_table(sample, exact_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan  # the documented cost of N exact distincts


def test_approx_close_to_exact_on_fixture(spark, sf_dir):
    from web3_flight_rpc_server_spark.sources import tables

    ev = tables.load_table(spark, sf_dir, "events")
    exact = {
        r.column: r.n_distinct
        for r in profile_table(ev, exact_distinct=True).collect()
    }
    approx = {
        r.column: r.n_distinct for r in profile_table(ev).collect()
    }
    for c, want in exact.items():
        assert abs(approx[c] - want) <= max(2, 0.05 * want), (
            f"{c}: {approx[c]} vs {want}"
        )


def test_zero_columns_refused(spark):
    with pytest.raises(ValueError, match="zero-column"):
        profile_table(spark.createDataFrame([], "").select())


def test_drift_report_flags_each_class(spark):
    from web3_flight_rpc_server_spark.operators.profile import profile_drift

    old = spark.createDataFrame(
        [
            ("stable", "bigint", 100, 0, 0.0, 50, "1", "99"),
            ("nully", "string", 100, 2, 0.02, 30, "a", "z"),
            ("shrinks", "string", 100, 0, 0.0, 40, "a", "z"),
            ("retyped", "bigint", 100, 0, 0.0, 10, "1", "9"),
            ("gone", "string", 100, 0, 0.0, 5, "a", "b"),
        ],
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_frac double, n_distinct long, min_value string, max_value string",
    )
    new = spark.createDataFrame(
        [
            ("stable", "bigint", 100, 1, 0.01, 52, "1", "99"),
            ("nully", "string", 100, 40, 0.40, 30, "a", "z"),
            ("shrinks", "string", 100, 0, 0.0, 4, "a", "z"),
            ("retyped", "string", 100, 0, 0.0, 10, "1", "9"),
            ("born", "double", 100, 0, 0.0, 7, "0.1", "2.2"),
        ],
        old.schema,
    )
    rep = {r.column: r for r in profile_drift(old, new).collect()}
    assert not rep["stable"].drifted
    assert rep["nully"].flags == ["null_spike"]
    assert rep["shrinks"].flags == ["cardinality_shift"]
    assert rep["retyped"].flags == ["type_changed"]
    assert rep["gone"].flags == ["dropped"]
    assert rep["born"].flags == ["added"]
