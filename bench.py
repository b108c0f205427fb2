"""Benchmark harness: headline declared queries at the bench scale
factor, one JSON line on stdout.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench.py [--oracle] [--explain]

Protocol (round 3+): cold numbers are the PER-QUERY MEDIAN over
SPARK_GRAFT_BENCH_REPS (default 3) repetitions, each in a FRESH
process/JVM — single-shot cold timings on a shared box carry ±50%
startup/GC variance (BASELINE.md), which round 2 showed is easily
mistaken for a work regression. Per-query [min, max] spread is
reported alongside so an outlier repetition is visible instead of
silently folded in. Warm numbers are medians of each process's second
invocation (steady-state service cost). Each query is materialized
JVM-side with a noop write (full execution, no driver collect, no
Python serialization in the measurement).

--oracle additionally times DuckDB running the oracle SQL on the same
parquet (recorded in BASELINE.md); --explain dumps formatted physical
plans to bench_plans.txt for shuffle/pushdown review.

Protocol additions (r15): the canonical record also carries a
PER-QUERY FRESH-JVM ISOLATE column (``queries_isolated`` = steady 3rd
run, ``queries_isolated_cold``) — the shared loop aliases loop
position into query cost (accumulated JVM/heap state inflated
late-loop queries 20-40% warm in the r14 record while their isolates
and plans were unchanged), so round-over-round comparisons should
read the isolate column for per-query regressions and the loop
columns for whole-service behavior. Budget-capped via
$SPARK_GRAFT_ISOLATE_BUDGET (seconds, default 600; 0 disables;
partial column flagged ``isolated_partial``). NOTE on the low-core
scaling run: at sf0.1 the whole suite is scheduler/driver-floor-bound
(the r14 driver's 8-core total equaled its 32-core total), so
per-query core-scaling ratios at this SF carry no signal about scale
behavior — the sf1/sf10 isolate records (BENCH_isolated_sf*.json)
are where parallelism is measurable.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
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
    "q_simhash",               # SimHash fingerprints + chunk-blocked pairs
    "q_winnow_overlap",        # winnowing substring-overlap pairs
    "q_bm25",                  # BM25 relevance top-k
    "q_cosine_topk",           # brute-force cosine top-k
    "q_ivf_topk",              # pruned top-k over the partitioned IVF index
                               # (index build + query collect run inside fn(),
                               # BEFORE the timer: the timed number is query
                               # serving against a built index — the amortized
                               # deployment shape, not build+query. r2's
                               # in-situ variant DID pay assignment in-query,
                               # so the 1.53->0.48 cold drop is a path change,
                               # not a like-for-like speedup.)
    "q_semantic_dedup",        # SemDeDup cell-blocked embedding near-dup
                               # (top-2-of-8 anchor cells, per-cell
                               # gallery matmul + codegen fold confirm)
    "q_text_pipeline",         # lang/quality gates -> dedup -> fingerprint
    "q_repetition",            # Gopher repeated-bigram gate (2 hash aggs)
    "q_curation_funnel",       # full curation pipeline (gates->dedup->LSH->
                               # components->decontam->blocklist), per-doc ledger
    "q_train_split",           # deterministic hash-bucket split
    "q_scalar_subquery",       # subquery planning
    "q_pack",                  # pretraining sequence packing (two-phase
                               # distributed prefix sum; DECLARED r9)
    "q_chunk",                 # overlapping fixed-token chunking
                               # (map-only posexplode; DECLARED r9)
    "q_bpe_pairs",             # BPE training's per-round primitive:
                               # word-freq table -> adjacent-pair hash
                               # agg -> deterministic argmax top-20
                               # (DECLARED r11)
    "q_perplexity",            # bigram-LM fit + per-doc perplexity
                               # (trained CCNet quality tier; r11,
                               # undeclared oracle-parity)
    "q_dsir",                  # DSIR hashed-ngram importance
                               # resampling, Gumbel top-k (r11,
                               # undeclared oracle-parity)
    "q_paragraph_dedup",       # Dolma paragraph-level exact dedup:
                               # keep-first + in-order rebuild (r11,
                               # undeclared oracle-parity)
    "q_substring_dedup",       # Lee et al. ExactSubstr span removal:
                               # k-token window keep-first + token
                               # rebuild (r12, DECLARED)
    "q_containment_blocked",   # winnow-propose + exact-confirm
                               # directed containment, the 100 TB
                               # short-in-long path (DECLARED r14)
    "q_langid",                # trained multiclass lang-id: softmax
                               # fit + persisted-weight scoring
                               # (DECLARED r14; 36-query headline)
]

# Queries whose fn() runs EAGER Spark jobs at plan-build time (the
# funnel's component iterations and checkpoints): the timer starts
# BEFORE fn() so the number is build+execute and can't be moved by
# shifting work across the build/write boundary (round-4 verdict #5).
# q_ivf_topk stays build-exempt BY DESIGN: its fn() builds the
# partitioned index before the timer because the timed artifact is
# query-against-built-index, the amortized deployment shape (see the
# HEADLINE comment above).
EAGER_BUILD = {"q_curation_funnel", "q_langid"}  # langid: the softmax
# fit's per-iteration gradient collects run inside fn() — the timed
# number must be train+score, not score-only


def run_single_pass(sf_dir: str, dump_plans: bool) -> int:
    """One cold+warm measurement pass in THIS process; prints a JSON
    line {"queries": ..., "queries_warm": ...}. Invoked as a fresh
    subprocess per repetition so every cold number pays the same
    JVM/codegen startup, none inherits another repetition's heap."""
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
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        if name not in EAGER_BUILD:
            t0 = time.perf_counter()
        if dump_plans:
            plans.append(f"==== {name} ====\n" + df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
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
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        if name not in EAGER_BUILD:
            t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)
        release_caches()

    if dump_plans:
        with open(os.path.join(REPO, "bench_plans.txt"), "w") as f:
            f.write("\n\n".join(plans))

    print("PASS_JSON " + json.dumps({"queries": timings, "queries_warm": warm}))
    spark.stop()
    return 0


def run_isolate_one(sf_dir: str, name: str) -> int:
    """One query in THIS fresh process: cold + 2 warm runs (the 3rd
    is the steady state). Internal worker for --isolate."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.registry import all_queries
    from web3_flight_rpc_server_spark.session import get_spark

    registry = all_queries()
    spark = get_spark("bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    q = registry[name]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        if name not in EAGER_BUILD:
            t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        release_caches()
    print("ISOLATE_JSON " + json.dumps({"name": name, "runs": runs}))
    spark.stop()
    return 0


def run_isolated(sf_dir: str) -> int:
    """Per-query PROCESS isolation: every headline query gets its own
    fresh JVM running cold + 2 warm invocations; the 3rd run is the
    steady state. This is the honest warm protocol at big scale
    factors — the shared-JVM warm pass accumulates heap/GC debt that
    inflates LATER queries by up to an order of magnitude at sf10
    (BASELINE.md round-7 section; q_bm25 measured 80.9 s in the
    shared pass vs 3.1 s isolated). Costs one JVM startup per query,
    so it is the sf>=10 protocol, not the default."""
    pass_timeout = int(os.environ.get("SPARK_GRAFT_PASS_TIMEOUT", "1800"))
    cold, steady, runs_all, errors = {}, {}, {}, {}
    names = list(HEADLINE)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record_path = os.path.join(REPO, f"BENCH_isolated_sf{sf}.json")
    if "--only" in sys.argv:
        # subset re-run that MERGES into the existing record: used to
        # fold a fixed query back into a mostly-green isolate record
        # without paying the full multi-hour pass again (r10: the
        # semdedup tiling fix needed exactly this). Prior rows load
        # first; the re-run rows overwrite theirs and clear their
        # errors entries; totals recompute over the union.
        names = [n for n in sys.argv[sys.argv.index("--only") + 1]
                 .split(",") if n]
        unknown = [n for n in names if n not in HEADLINE]
        if unknown:
            print(f"--only: not in HEADLINE: {unknown}", file=sys.stderr)
            return 2
        if os.path.exists(record_path):
            with open(record_path) as f:
                prior = json.load(f)
            runs_all = {k: v for k, v in prior.get("runs", {}).items()
                        if k not in names}
            cold = {k: v[0] for k, v in runs_all.items()}
            steady = {k: v[2] for k, v in runs_all.items()}
            errors = {k: v for k, v in prior.get("errors", {}).items()
                      if k not in names}
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--isolate-one", name],
                capture_output=True, text=True, timeout=pass_timeout,
                env=os.environ,
            )
            err_tail = proc.stderr[-2000:]
        except subprocess.TimeoutExpired:
            proc, err_tail = None, f"timeout after {pass_timeout}s"
        payload = None
        if proc is not None:
            for line in proc.stdout.splitlines():
                if line.startswith("ISOLATE_JSON "):
                    payload = json.loads(line[len("ISOLATE_JSON "):])
        if payload is None:
            # record and continue: at sf>=10 one pathological query
            # must not discard the other ~28 queries' finished runs —
            # the error lands in the JSON so the gap is loud, not
            # silently skipped
            errors[name] = err_tail
            print(f"ISOLATE_FAIL {name}: {err_tail}", file=sys.stderr)
            continue
        runs_all[name] = payload["runs"]
        cold[name] = payload["runs"][0]
        steady[name] = payload["runs"][2]
    out = {
        "metric": "headline_queries_total_wall_isolated",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "queries_steady": steady,
        "steady_total": round(sum(steady.values()), 3),
        "sf": sf,
        # n_ok/n_failed make a partial pass unmistakable: the totals
        # above sum only the succeeding subset, so without these a
        # partially failed pass would report a LOWER (better-looking)
        # total than a clean pass (r10 ADVICE)
        "n_ok": len(cold),
        "n_failed": len(HEADLINE) - len(cold),
    }
    if errors:
        out["errors"] = errors
        out["totals_partial"] = True
    with open(record_path, "w") as f:
        json.dump(dict(out, runs=runs_all), f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    # nonzero exit on any failure so an exit-code gate cannot read a
    # partial (lower) total as an improvement
    return 1 if errors else 0


def measure_ingest() -> dict:
    """Backfill ingest throughput through the live-source plumbing
    (Python DataSource, paged partitions), measured in a FRESH
    PROCESS: this figure's role is the ENGINE-SIDE ceiling, and
    sharing a JVM with the query loops contaminates it both ways —
    the loops' heap/GC debt depresses ingest 3-4x (9.6k vs 35k
    blocks/s), while running the 1M-row ingest first inflates cold
    query totals ~3x. spark.stop() is not enough (py4j keeps the same
    JVM), so the measurement subprocesses. The mock transport
    generates rows in-process, so the number excludes node/network
    latency, while the reference's ~1,000 blocks/s operational
    envelope (BASELINE.md) includes it; the comparison shows the
    engine is not the backfill bottleneck. A warmup read inside the
    subprocess pays the one-time Python-worker spin-up outside the
    measurement, like any long-running backfill would; best-of-2
    because single-shot throughput still ramps (JIT, worker reuse)
    and the reported number is a ceiling.

    PROTOCOL (r14, pinning the r13 VERDICT #6 ask): the headline
    ``ingest_blocks_per_s`` is the MEDIAN of ``runs`` fresh-process
    measurements (default 5, SPARK_GRAFT_INGEST_RUNS to override),
    with every per-run value recorded alongside — the figure swung
    18.1k -> 36.1k blocks/s across single-shot sessions with zero
    source changes, so one subprocess under-constrains it;
    round-over-round comparisons should read the median against the
    previous round's recorded spread."""
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
    runs = max(1, int(os.environ.get("SPARK_GRAFT_INGEST_RUNS", "5")))
    rates: list[float] = []
    for _ in range(runs):
        proc = subprocess.run(
            [sys.executable, "-c", ingest_script],
            capture_output=True, text=True, timeout=600,
        )
        rate = None
        for line in proc.stdout.splitlines():
            if line.startswith("INGEST_S "):
                rate = ingest_blocks / float(line.split()[1])
        if rate is None:
            raise RuntimeError(
                f"ingest bench subprocess failed: {proc.stderr[-2000:]}"
            )
        rates.append(round(rate))
    return {
        "median": round(statistics.median(rates)),
        "min": min(rates),
        "max": max(rates),
        "runs": rates,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    time_oracle = "--oracle" in sys.argv
    dump_plans = "--explain" in sys.argv
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--single-pass" in sys.argv:
        return run_single_pass(sf_dir, dump_plans)

    if "--isolate" in sys.argv:
        return run_isolated(sf_dir)

    if "--isolate-one" in sys.argv:
        return run_isolate_one(sf_dir, sys.argv[sys.argv.index(
            "--isolate-one") + 1])

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # One pass comfortably fits 1800 s at sf<=1; the sf10 tier needs
    # ~10x the budget (SPARK_GRAFT_PASS_TIMEOUT to override).
    pass_timeout = int(os.environ.get("SPARK_GRAFT_PASS_TIMEOUT", "1800"))
    passes: list[dict] = []
    for i in range(reps):
        args = [sys.executable, os.path.abspath(__file__), "--single-pass"]
        if dump_plans and i == 0:
            args.append("--explain")
        proc = subprocess.run(args, capture_output=True, text=True,
                              timeout=pass_timeout, env=os.environ)
        payload = None
        for line in proc.stdout.splitlines():
            if line.startswith("PASS_JSON "):
                payload = json.loads(line[len("PASS_JSON "):])
        if payload is None:
            raise RuntimeError(
                f"bench pass {i} failed: {proc.stderr[-2000:]}"
            )
        passes.append(payload)

    def median_and_spread(key: str) -> tuple[dict, dict]:
        med, spread = {}, {}
        for name in HEADLINE:
            vals = sorted(p[key][name] for p in passes)
            med[name] = round(statistics.median(vals), 3)
            spread[name] = [vals[0], vals[-1]]
        return med, spread

    cold, cold_spread = median_and_spread("queries")
    warm, warm_spread = median_and_spread("queries_warm")

    # Per-query fresh-JVM isolate column (r15 — r14 VERDICT #1/#9):
    # the shared 36-query loop aliases LOOP POSITION into query cost
    # (accumulated JVM/heap/JIT state inflated the fingerprint family
    # ~20-40% warm in the r14 record while their isolates and plans
    # were unchanged), so the canonical record now carries loop-free
    # evidence alongside: one --isolate-one subprocess per query
    # (cold + 2 warm; the 3rd run is the steady state). ADDITIVE —
    # the cold/warm medians above keep the identical methodology.
    # Budget-capped so a slow box or big SF degrades to a partial
    # column (flagged), never a blown driver wall-clock.
    iso_cold: dict[str, float] = {}
    iso_steady: dict[str, float] = {}
    iso_partial = False
    iso_budget = float(os.environ.get("SPARK_GRAFT_ISOLATE_BUDGET",
                                      "600"))
    if iso_budget > 0:
        t_iso = time.perf_counter()
        for name in HEADLINE:
            left = iso_budget - (time.perf_counter() - t_iso)
            if left <= 0:
                iso_partial = True
                break
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--isolate-one", name],
                    capture_output=True, text=True,
                    timeout=max(30.0, min(left, 300.0)),
                    env=os.environ,
                )
            except subprocess.TimeoutExpired:
                iso_partial = True
                continue
            for line in proc.stdout.splitlines():
                if line.startswith("ISOLATE_JSON "):
                    runs = json.loads(
                        line[len("ISOLATE_JSON "):])["runs"]
                    iso_cold[name] = runs[0]
                    iso_steady[name] = runs[2]

    oracle_timings: dict[str, float] = {}
    if time_oracle:
        import duckdb

        from web3_flight_rpc_server_spark.registry import all_queries

        registry = all_queries()
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

    total = round(sum(cold.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "reps": reps,
        # median of N fresh-process runs; the full spread rides along
        # (the r14 ingest protocol — see measure_ingest)
        "ingest_blocks_per_s": (ing := measure_ingest())["median"],
        "ingest_spread": ing,
        "sf": sf,
    }
    if iso_cold:
        out["queries_isolated"] = iso_steady
        out["queries_isolated_cold"] = iso_cold
        if iso_partial:
            out["isolated_partial"] = True
    if oracle_timings:
        out["oracle_queries"] = oracle_timings
        out["oracle_total"] = round(sum(oracle_timings.values()), 3)
    # The per-query [min, max] spreads triple the line length; a tail
    # capture of stdout (how the round driver records the result)
    # would truncate mid-JSON and record parsed=null, as happened in
    # round 3. The printed line stays compact; the FULL record —
    # spreads included — always lands in BENCH_local.json, written
    # whole before anything is printed.
    full = dict(out, queries_spread=cold_spread,
                queries_warm_spread=warm_spread)
    # BENCH_local.json is the canonical sf0.1 record (what the driver
    # benches); other scales get their own snapshot file so an sf1 run
    # cannot clobber the canonical one
    fname = "BENCH_local.json" if sf == "0.1" else f"BENCH_sf{sf}.json"
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
