"""Physical-plan regression tests: the scale properties BASELINE.md
claims (pushdown, column pruning, broadcast joins, single-exchange
aggregations) are asserted here so a refactor that silently loses one
fails CI rather than only showing up as a 100 TB regression.

These inspect the OPTIMIZED physical plan string (pre-execution, AQE
not yet applied), so assertions are deterministic and data-independent.
"""

from __future__ import annotations

import re

import pytest

from web3_flight_rpc_server_spark.registry import all_queries

QUERIES = all_queries()


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def count_nodes(plan: str, node: str) -> int:
    # formatted explain prints each node twice (tree + details); count
    # the unique "(N) NodeName" detail headers.
    return len(re.findall(rf"^\(\d+\) {node}$", plan, re.M))


def final_plan_of(spark, name: str, sf_dir: str) -> str:
    """Execute the query and return ONLY the AQE final-plan sections of
    its adaptive plan dump. AdaptiveSparkPlan.toString interleaves
    '== Final Plan ==' / '== Initial Plan ==' blocks (nested ones too,
    via cached relations); a naive substring check over the whole dump
    reads pre-AQE join choices as if they were executed."""
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()
    dump = df._jdf.queryExecution().executedPlan().toString()
    keep, out = True, []
    for line in dump.split("\n"):
        if "== Final Plan ==" in line:
            keep = True
            continue
        if "== Initial Plan ==" in line:
            keep = False
            continue
        if keep:
            out.append(line)
    return "\n".join(out)


def test_range_scan_pushes_filters(spark, sf_dir):
    plan = plan_of(spark, "q_range_scan", sf_dir)
    assert "PushedFilters" in plan
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThanOrEqual" in m.group(1) and "LessThanOrEqual" in m.group(1)


def test_group_agg_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, "q_group_agg", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    ncols = len(m.group(1).split(","))
    assert ncols <= 7, f"lineitem scan reads {ncols} columns: {m.group(1)}"


def test_group_agg_partial_before_exchange(spark, sf_dir):
    plan = plan_of(spark, "q_group_agg", sf_dir)
    # partial HashAggregate must appear below the exchange: two
    # HashAggregate nodes and exactly one shuffle for the aggregation
    assert count_nodes(plan, "HashAggregate") >= 2
    assert count_nodes(plan, "Exchange") <= 1


def test_join_left_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q_join_left", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multi_join_all_broadcast_no_fact_shuffle(spark, sf_dir):
    plan = plan_of(spark, "q_multi_join", sf_dir)
    assert count_nodes(plan, "BroadcastHashJoin") == 5, plan
    assert "SortMergeJoin" not in plan
    # only shuffle = the final aggregation exchange
    assert count_nodes(plan, "Exchange") == 1, plan


def test_multi_join_pushes_date_filter(spark, sf_dir):
    plan = plan_of(spark, "q_multi_join", sf_dir)
    assert "GreaterThanOrEqual(o_orderdate" in plan
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m, "no lineitem scan found"
    assert len(m.group(1).split(",")) <= 4, m.group(1)


def test_filter_in_list_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, "q_filter_in_list", sf_dir)
    assert re.search(r"PushedFilters: \[[^\]]*In\(", plan), plan


def test_topk_per_group_single_window_shuffle(spark, sf_dir):
    plan = plan_of(spark, "q_window_funcs", sf_dir)
    # two window specs (priority rank, per-customer frame) -> 2 exchanges
    assert count_nodes(plan, "Exchange") <= 2, plan


@pytest.mark.parametrize("name", ["q_dedup", "q_group_agg", "q_train_split"])
def test_single_agg_exchange(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert count_nodes(plan, "Exchange") <= 1, name


def test_value_counts_agg_plus_sort_only(spark, sf_dir):
    # global ordering costs one range exchange on top of the agg
    # exchange; anything more is a regression
    plan = plan_of(spark, "q_value_counts", sf_dir)
    assert count_nodes(plan, "Exchange") == 2, plan
    assert count_nodes(plan, "HashAggregate") == 2, plan


def test_text_stats_no_python_and_one_exchange(spark, sf_dir):
    """The one-pass featurization stays JVM-side (no Python eval node
    in the plan — all HOF/regexp/md5 expressions) and pays exactly one
    exchange (the parallelism repartition)."""
    plan = plan_of(spark, "q_text_stats", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert count_nodes(plan, "Exchange") == 1, plan


def test_rollup_cube_expand_one_exchange_per_leg(spark, sf_dir):
    """Each grouping-set leg expands BEFORE its single aggregation
    exchange (partial agg applies to the expanded rows); the tagged
    union adds no exchange of its own."""
    plan = plan_of(spark, "q_rollup_cube", sf_dir)
    assert count_nodes(plan, "Expand") == 2, plan
    assert count_nodes(plan, "Exchange") == 2, plan
    assert count_nodes(plan, "Union") == 1, plan


def test_scan_project_reads_needed_columns_only(spark, sf_dir):
    plan = plan_of(spark, "q_scan_project", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= 7, m.group(1)


def test_curation_funnel_plan_shape(spark, sf_dir):
    """The funnel must stay cartesian-free, broadcast its tiny sides
    (benchmark shingles, reject map), and reuse the persisted gate
    projection instead of re-scanning the corpus per stage branch."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches

    try:
        plan = plan_of(spark, "q_curation_funnel", sf_dir)
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, (
            "stage branches must read the persisted gate projection"
        )
        # the exact-dup ledger must be min-per-key + join-back, never a
        # collect_list of every duplicate id in one aggregation buffer
        # (unbounded per-key state = skewed-key OOM on boilerplate text)
        assert "collect_list" not in plan
    finally:
        release_caches()


def test_declared_funnel_runs_lsh_tier(spark, sf_dir, monkeypatch):
    """The DECLARED funnel must run the production MinHash-LSH
    near-dup tier, never the quadratic exact-Jaccard self-join kept
    for ground truth. The tier is invisible in the final physical plan
    (connected_components checkpoint-truncates the pair lineage), so
    assert behaviorally: the exact tier must not be invoked at all,
    and the LSH pipeline must be invoked exactly once."""
    from web3_flight_rpc_server_spark.operators import dedup as dedup_mod
    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.pipelines import curation as pipe_mod

    calls = {"lsh": 0}
    real_lsh = dedup_mod.minhash_lsh_dedup_pairs

    def counting_lsh(*a, **kw):
        calls["lsh"] += 1
        return real_lsh(*a, **kw)

    def forbidden_exact(*a, **kw):
        raise AssertionError(
            "declared funnel invoked the exact-Jaccard pair tier"
        )

    monkeypatch.setattr(pipe_mod, "minhash_lsh_dedup_pairs", counting_lsh)
    monkeypatch.setattr(dedup_mod, "ngram_jaccard_pairs", forbidden_exact)
    try:
        df = QUERIES["q_curation_funnel"].fn(spark, sf_dir)
        assert df.count() > 0
        assert calls["lsh"] == 1
    finally:
        release_caches()


def test_curation_funnel_aqe_executes_broadcast_joins(spark, sf_dir):
    """The funnel's static plan carries SortMergeJoins for the reject
    anti-joins and the final docs-to-rejects left join (correct at
    100 TB, where reject sets are NOT broadcastable); at fixture scale
    the reject sides are tiny, so AQE must convert every one of them
    to a broadcast in the EXECUTED plan. A regression that defeats the
    runtime conversion (e.g. a conf change or a shape AQE can't
    restat) would silently tax every small-scale run."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches

    try:
        final = final_plan_of(spark, "q_curation_funnel", sf_dir)
        assert "isFinalPlan=true" in final
        assert "SortMergeJoin" not in final
        assert "BroadcastQueryStage" in final
    finally:
        release_caches()


def test_dedup_clusters_single_pair_shuffle(spark, sf_dir):
    """Cluster input = the exact-Jaccard pair pipeline; the pair
    aggregation must keep its single-shuffle shape (no extra exchange
    sneaks in via the component loop's edge prep)."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches

    try:
        plan = plan_of(spark, "q_dedup_clusters", sf_dir)
        assert "CartesianProduct" not in plan
    finally:
        release_caches()


def test_simhash_no_cartesian_and_single_vote_exchange(spark, sf_dir):
    """The 64 bit-vote sums run as ONE hash aggregation (one exchange
    on doc id); candidates come from the chunk equi-join, never an
    all-pairs product."""
    plan = plan_of(spark, "q_simhash", sf_dir)
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_winnow_overlap_no_cartesian(spark, sf_dir):
    """Pair generation is the fingerprint equi-join (df-capped), never
    all-pairs."""
    plan = plan_of(spark, "q_winnow_overlap", sf_dir)
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_bm25_stats_fold_to_broadcasts(spark, sf_dir):
    """Corpus/df statistics join in as single-row broadcasts (the two
    BroadcastNestedLoopJoins ARE the crossJoins of 1-row stat frames);
    the per-doc side shuffles once for the tf aggregation and never
    sort-merges."""
    plan = plan_of(spark, "q_bm25", sf_dir)
    assert count_nodes(plan, "SortMergeJoin") == 0
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 2


def test_vocab_truncation_is_take_ordered(spark, sf_dir):
    """The top-V cut must be TakeOrdered (per-partition heaps, driver
    merge of V rows), never a global Sort of the frequency table; the
    token count aggregates partially before its single exchange."""
    plan = plan_of(spark, "q_vocab", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert count_nodes(plan, "Exchange") <= 3  # count agg + total agg + 1-row window


def test_unigram_scoring_joins_broadcast_only(spark, sf_dir):
    """The log-prob model and the doc-id completion join must both be
    broadcast — the corpus side (exploded tokens) never shuffles for a
    join."""
    from web3_flight_rpc_server_spark.operators.vocab import (
        build_vocabulary,
        unigram_logprob_score,
    )
    from web3_flight_rpc_server_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    scored = unigram_logprob_score(docs, build_vocabulary(docs, 500))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_none_cap_is_plan_noop(spark, sf_dir, monkeypatch):
    """VERDICT r5 #2a: _drop_hot_buckets(max_bucket=None) must add
    ZERO nodes/persists to q_simhash's plan — the explicit-None oracle
    path (and any uncapped caller) pays nothing for the cap plumbing.
    Pinned by comparing the formatted plan against a build where the
    cap hook is replaced by identity."""
    from web3_flight_rpc_server_spark.operators import dedup as dedup_mod

    with_hook = plan_of(spark, "q_simhash", sf_dir)
    monkeypatch.setattr(
        dedup_mod, "_drop_hot_buckets", lambda keyed, key_cols, mb: keyed
    )
    without_hook = plan_of(spark, "q_simhash", sf_dir)
    # formatted plans are structurally identical (node ids and exprs
    # included); normalize only the auto-generated expression/plan ids
    def norm(p):
        return re.sub(r"plan_id=\d+", "plan_id=x", re.sub(r"#\d+", "#x", p))

    assert norm(with_hook) == norm(without_hook)
