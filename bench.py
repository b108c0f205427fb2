"""Benchmark harness: headline declared queries at the bench scale
factor, one JSON line on stdout.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench.py [--oracle] [--explain]

Each query is materialized JVM-side with a noop write (full execution,
no driver collect, no Python serialization in the measurement).
--oracle additionally times DuckDB running the oracle SQL on the same
parquet (recorded in BASELINE.md); --explain dumps formatted physical
plans to bench_plans.txt for shuffle/pushdown review.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# A representative slice of SURVEY.md §2: scan-heavy, agg-heavy,
# join/window/streaming-twin, and the north-star text/dedup/vector ops.
HEADLINE = [
    "q_range_scan",            # pushdown range scan
    "q_scan_project",          # projection + cast
    "q_value_counts",          # flagship hash agg
    "q_group_agg",             # TPC-H-Q1-shaped multi-agg
    "q_distinct_count",        # exact distinct
    "q_join_left",             # broadcast fact->dim join
    "q_multi_join",            # TPC-H Q5 snowflake, all-broadcast
    "q_join_asof",             # as-of join (union + window)
    "q_window_funcs",          # ranking + analytic windows
    "q_sessionize",            # gap sessionization
    "q_tumbling_window",       # time-bucket agg
    "q_map_lookup",            # map lookup + JSON path per row
    "q_text_stats",            # text features per doc
    "q_dedup",                 # exact dedup
    "q_dedup_jaccard",         # shingle self-join pairwise jaccard
    "q_minhash_lsh",           # MinHash-LSH near-dup pipeline
    "q_cosine_topk",           # brute-force cosine top-k
    "q_ivf_topk",              # IVF-pruned approximate top-k
    "q_text_pipeline",         # lang/quality gates -> dedup -> fingerprint
    "q_train_split",           # deterministic hash-bucket split
    "q_scalar_subquery",       # subquery planning
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    time_oracle = "--oracle" in sys.argv
    dump_plans = "--explain" in sys.argv
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from web3_flight_rpc_server_spark.registry import all_queries
    from web3_flight_rpc_server_spark.session import get_spark

    registry = all_queries()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session outside the measurement (class loading,
    # first-parquet-footer costs), as any long-lived service would be.
    registry["q_value_counts"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    plans: list[str] = []
    for name in HEADLINE:
        q = registry[name]
        df = q.fn(spark, sf_dir)
        if dump_plans:
            plans.append(f"==== {name} ====\n" + df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Second invocation per query: first-run numbers carry ~0.3-0.5 s
    # of one-time codegen compilation and AQE re-planning per query; the
    # warm column is the steady-state cost a long-lived service sees,
    # so real-work regressions aren't masked by floor noise.
    warm: dict[str, float] = {}
    for name in HEADLINE:
        df = registry[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)

    # Backfill ingest throughput through the live-source plumbing
    # (Python DataSource, paged partitions). The mock transport makes
    # this the ENGINE-side ceiling — rows are generated in-process, so
    # the number excludes node/network latency, while the reference's
    # ~1,000 blocks/s operational envelope (BASELINE.md) includes it;
    # the comparison shows the engine is not the bottleneck. A small
    # warmup read pays the one-time Python-worker spin-up outside the
    # measurement, like any long-running backfill would.
    from web3_flight_rpc_server_spark.sources.ethereum_rpc import (
        EthereumLogsDataSource,
    )

    spark.dataSource.register(EthereumLogsDataSource)

    def _ingest(n_blocks: int) -> float:
        t0 = time.perf_counter()
        (
            spark.read.format("ethereum_logs")
            .option("startBlock", 0).option("endBlock", n_blocks - 1)
            .option("transport", "mock").option("maxBlockRange", 500)
            .load().write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    _ingest(2_000)  # warmup: Python worker spin-up
    ingest_blocks = 50_000
    ingest_s = _ingest(ingest_blocks)

    oracle_timings: dict[str, float] = {}
    if time_oracle:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in HEADLINE:
            oracle = registry[name].oracle
            if not oracle:
                continue
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            oracle_timings[name] = round(time.perf_counter() - t0, 3)

    if dump_plans:
        with open(os.path.join(REPO, "bench_plans.txt"), "w") as f:
            f.write("\n\n".join(plans))

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "ingest_blocks_per_s": round(ingest_blocks / ingest_s),
        "sf": sf,
    }
    if oracle_timings:
        out["oracle_queries"] = oracle_timings
        out["oracle_total"] = round(sum(oracle_timings.values()), 3)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
