"""Scale datapoint for the trained semantic index probe (VERDICT r8
next-round #3): build the trained index from benchdata/sf1 (20k
vectors) and benchdata/sf10 (200k vectors), probe the SAME 1,000-vector
batch against each, and time the probe cold/warm. The design claim
under test: probe cost is bounded by the matched cells' population
(plan-time PartitionFilters pruning + one cell exchange per cogroup
side), so 10x the index costs far less than 10x the probe.

Also measures the compaction effect: after fragmenting the index into
per-batch appends (the streaming-ingest layout), probe again, compact
(operators/kmeans.py:compact_trained_ivf_index), probe again — the
delta is the small-files open/footer tax compaction exists to remove.

Run standalone (never concurrently with a bench):
    python tools/semantic_probe_scale.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return ts


def main() -> None:
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.operators.kmeans import (
        compact_trained_ivf_index,
        kmeans_fit,
        write_trained_ivf_index,
    )
    from web3_flight_rpc_server_spark.operators.semdedup import (
        dedup_embeddings_against_index,
    )
    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("semantic_probe_scale")
    spark.sparkContext.setLogLevel("ERROR")

    # one probe batch reused against both indexes: 1,000 corpus
    # vectors with a small perturbation (near-dups the probe must find)
    sf1 = spark.read.parquet(f"{REPO}/benchdata/sf1/embeddings.parquet")
    probe_rows = sf1.orderBy("vec_id").limit(1000).collect()
    rng = np.random.default_rng(71)
    probe = spark.createDataFrame(
        [
            (
                1_000_000 + r.vec_id,
                [float(v) for v in
                 np.asarray(r.embedding) + 0.001 * rng.normal(size=64)],
            )
            for r in probe_rows
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)

    for sf in ("sf1", "sf10"):
        emb = spark.read.parquet(
            f"{REPO}/benchdata/{sf}/embeddings.parquet"
        )
        n = emb.count()
        model = kmeans_fit(emb, k=20, max_iter=10, init_method="pp")
        path = f"/tmp/sem_probe_scale_{sf}"
        t0 = time.time()
        write_trained_ivf_index(emb, model, path)
        build = time.time() - t0

        def run():
            return dedup_embeddings_against_index(
                probe, path, threshold=0.95
            ).count()

        pairs = run()  # cold-ish (plan+codegen) — timed separately below
        ts = _time(run, reps=3)
        print(
            f"{sf}: n={n} build={build:.2f}s "
            f"probe={['%.2f' % t for t in ts]} pairs={pairs}"
        )

        # fragment: re-write as 20 per-batch appends, probe, compact,
        # probe again (sf1 only — the effect is file-count, not size)
        if sf == "sf1":
            frag = f"/tmp/sem_probe_scale_{sf}_frag"
            write_trained_ivf_index(emb.limit(0), model, frag)
            for i in range(20):
                batch = emb.where(F.col("vec_id") % 20 == i)
                write_trained_ivf_index(batch, model, frag, append=True)

            def run_frag():
                return dedup_embeddings_against_index(
                    probe, frag, threshold=0.95
                ).count()

            run_frag()
            ts_frag = _time(run_frag, reps=3)
            n_before, n_after = compact_trained_ivf_index(spark, frag)
            ts_comp = _time(run_frag, reps=3)
            print(
                f"{sf} fragmented({n_before} files): "
                f"probe={['%.2f' % t for t in ts_frag]} -> "
                f"compacted({n_after} files): "
                f"probe={['%.2f' % t for t in ts_comp]}"
            )


if __name__ == "__main__":
    main()
