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
    "q_repetition",            # Gopher repeated-bigram gate (2 hash aggs)
    "q_curation_funnel",       # full curation pipeline (gates->dedup->LSH->
                               # components->decontam->blocklist), per-doc ledger
    "q_train_split",           # deterministic hash-bucket split
    "q_scalar_subquery",       # subquery planning
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    time_oracle = "--oracle" in sys.argv
    dump_plans = "--explain" in sys.argv
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from web3_flight_rpc_server_spark.operators.dedup import release_caches
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
        # Release the dedup tiers' persisted intermediates after each
        # timed action (outside the measured window), the same cache
        # lifecycle the Flight server applies per request. Without
        # this, 40+ sequential invocations accumulate executor storage
        # and the resulting GC pressure corrupts later measurements
        # (observed: a 31 s q_map_lookup in the warm pass).
        release_caches()

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
        release_caches()

    # Backfill ingest throughput through the live-source plumbing
    # (Python DataSource, paged partitions), measured in a FRESH
    # PROCESS: this figure's role is the ENGINE-SIDE ceiling, and
    # sharing a JVM with the 44-invocation query loops contaminates
    # it both ways — the loops' heap/GC debt depresses ingest 3-4x
    # (9.6k vs 35k blocks/s), while running the 1M-row ingest first
    # inflates the cold query totals ~3x. spark.stop() is not enough
    # (py4j keeps the same JVM), so the measurement subprocesses. The
    # mock transport generates rows in-process, so the number excludes
    # node/network latency, while the reference's ~1,000 blocks/s
    # operational envelope (BASELINE.md) includes it; the comparison
    # shows the engine is not the backfill bottleneck. A warmup read
    # inside the subprocess pays the one-time Python-worker spin-up
    # outside the measurement, like any long-running backfill would;
    # best-of-2 because single-shot throughput still ramps (JIT,
    # worker reuse) and the reported number is a ceiling.
    ingest_blocks = 50_000
    ingest_script = f"""
import sys, time
sys.path.insert(0, {REPO!r})
from web3_flight_rpc_server_spark.session import get_spark
from web3_flight_rpc_server_spark.sources.ethereum_rpc import EthereumLogsDataSource
spark = get_spark("bench-ingest")
spark.sparkContext.setLogLevel("ERROR")
spark.dataSource.register(EthereumLogsDataSource)
def ingest(n):
    t0 = time.perf_counter()
    (spark.read.format("ethereum_logs")
     .option("startBlock", 0).option("endBlock", n - 1)
     .option("transport", "mock").option("maxBlockRange", 500)
     .load().write.format("noop").mode("overwrite").save())
    return time.perf_counter() - t0
ingest(2_000)
print("INGEST_S", min(ingest({ingest_blocks}) for _ in range(2)))
"""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-c", ingest_script],
        capture_output=True, text=True, timeout=600,
    )
    ingest_s = None
    for line in proc.stdout.splitlines():
        if line.startswith("INGEST_S "):
            ingest_s = float(line.split()[1])
    if ingest_s is None:
        raise RuntimeError(f"ingest bench subprocess failed: {proc.stderr[-2000:]}")

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
