"""Measure the semantic_dup gate's cost on the PRODUCTION curation
funnel (VERDICT r9 next-round #5): the declared q_curation_funnel
runs the MinHash-LSH tier with ``embeddings=None``; the r9 gate's
production shape for embedding corpora adds the survivor-scoped
SemDeDup keep-set. This harness times BOTH variants on the SAME tier
(pairs_fn=None, the scale path) so the delta is the gate itself, not
a tier change.

    python tools/funnel_gate_bench.py [sf_dir] [reps]

Protocol mirrors bench.py's funnel treatment: build+execute timing
(the funnel runs eager jobs — components, checkpoints — at plan-build
time, so the timer starts BEFORE fn-build; EAGER_BUILD), one fresh
process per repetition, cold + warm (second invocation) per process,
median across reps. The gate runs at threshold 0.3 — the synthetic
corpus's non-vacuous operating point (max pairwise cosine ~0.51;
the 0.9 production default would reject nothing here and measure
only the blocking+matmul floor).

Also dumps the gated variant's formatted plan to
/tmp/funnel_gate_plan.txt and reports how many parquet scans of the
documents table it contains — the persisted-scan property (one scan
feeds every gate branch) must hold with the gate ON.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_variant(sf_dir: str, gated: bool, dump_plan: bool) -> int:
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
        curation_rejects,
    )
    from web3_flight_rpc_server_spark.session import get_spark
    from web3_flight_rpc_server_spark.sources import tables

    spark = get_spark("funnel-gate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # session warmup outside the measurement, as bench.py does
    tables.load_table(spark, sf_dir, "documents").count()

    def build():
        docs = tables.load_table(spark, sf_dir, "documents")
        emb = None
        if gated:
            emb = tables.load_table(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding"
            )
        cfg = CurationConfig(semantic_threshold=0.3)
        rejects = curation_rejects(docs, cfg, pairs_fn=None,
                                   embeddings=emb)
        return docs.join(rejects, "doc_id", "left").select(
            "doc_id",
            F.coalesce("reject_reason", F.lit("kept")).alias("stage"),
        )

    out = {}
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        df = build()
        if dump_plan and label == "cold":
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open("/tmp/funnel_gate_plan.txt", "w") as f:
                f.write(plan)
        df.write.format("noop").mode("overwrite").save()
        out[label] = round(time.perf_counter() - t0, 3)
        release_caches()
    print("VARIANT_JSON " + json.dumps(out))
    spark.stop()
    return 0


def main() -> int:
    if "--variant" in sys.argv:
        i = sys.argv.index("--variant")
        sf_dir = sys.argv[i + 1]
        gated = sys.argv[i + 2] == "gated"
        return run_variant(sf_dir, gated, "--explain" in sys.argv)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = {}
    for gated in (False, True):
        name = "gated" if gated else "lexical"
        colds, warms = [], []
        for r in range(reps):
            args = [sys.executable, os.path.abspath(__file__),
                    "--variant", sf_dir, name]
            if gated and r == 0:
                args.append("--explain")
            proc = subprocess.run(args, capture_output=True, text=True,
                                  timeout=1800, env=os.environ)
            payload = None
            for line in proc.stdout.splitlines():
                if line.startswith("VARIANT_JSON "):
                    payload = json.loads(line[len("VARIANT_JSON "):])
            if payload is None:
                raise RuntimeError(
                    f"{name} rep {r} failed: {proc.stderr[-2000:]}"
                )
            colds.append(payload["cold"])
            warms.append(payload["warm"])
        results[name] = {
            "cold": round(statistics.median(colds), 3),
            "warm": round(statistics.median(warms), 3),
            "cold_spread": [min(colds), max(colds)],
            "warm_spread": [min(warms), max(warms)],
        }
    doc_scans = None
    try:
        with open("/tmp/funnel_gate_plan.txt") as f:
            plan = f.read()
        doc_scans = plan.count("documents.parquet")
    except FileNotFoundError:
        pass
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps, "results": results,
        "gate_cost_warm_sec": round(
            results["gated"]["warm"] - results["lexical"]["warm"], 3
        ),
        "documents_scans_in_gated_plan": doc_scans,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
