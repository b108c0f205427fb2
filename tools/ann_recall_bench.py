"""Measured IVF ANN recall vs probe depth (C12 scale path).

The IVF tier's accuracy knob is ``n_probe`` (search p of K cells ->
scan ~p/K of the corpus); the docstrings state the trade but, like the
LSH banding math before round 5, no MEASURED recall curve existed.
This harness generates a clustered embedding corpus (seeded Gaussian
blobs — the regime where an inverted file earns its keep), computes
exact brute-force cosine top-k ground truth in numpy (driver-side:
the truth computation is the oracle, not the system under test), and
reports recall@k of `ivf_topk` across an ``n_probe`` sweep.

Run standalone for the scale measurement (one JSON line):

    python tools/ann_recall_bench.py [--n 50000] [--dim 32] \
        [--queries 20] [--seed 11]

tests/test_ann_recall.py runs a small twin with flake-safe floors:
full probe ~exact, recall rising with probe depth, and a floor at the
default partial probe.
"""

from __future__ import annotations

import numpy as np

DEFAULT_PROBES = (1, 2, 4, 8, 16)


def make_blob_corpus(n: int = 50_000, dim: int = 32, n_blobs: int = 24,
                     queries: int = 20, seed: int = 11):
    """Returns (vectors: ndarray[n, dim], query_vecs: ndarray[q, dim]).
    Blob centers are unit-ish Gaussians; members get sigma=0.15 noise;
    queries are fresh draws near randomly chosen centers (never corpus
    members, so truth is a real neighbor search, not self-lookup)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_blobs, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    q_assign = rng.integers(0, n_blobs, size=queries)
    qvecs = centers[q_assign] + 0.15 * rng.normal(size=(queries, dim))
    return vecs, qvecs


def brute_truth(vecs: np.ndarray, qvec: np.ndarray, k: int) -> list[int]:
    """Exact cosine top-k ids (ties broken by id asc, matching the
    engine's orderBy(cos desc, id asc) contract)."""
    norms = np.linalg.norm(vecs, axis=1) * np.linalg.norm(qvec)
    cos = (vecs @ qvec) / np.where(norms == 0, 1.0, norms)
    # stable sort on (-cos, id): lexsort's last key is primary
    order = np.lexsort((np.arange(len(cos)), -cos))
    return [int(i) for i in order[:k]]


def measure(spark, vecs: np.ndarray, qvecs: np.ndarray, k: int = 10,
            n_cells: int = 16,
            probes: tuple[int, ...] = DEFAULT_PROBES) -> dict:
    """recall@k of ivf_topk per n_probe, averaged over the queries."""
    import time

    from web3_flight_rpc_server_spark.operators.ivf import ivf_topk

    dim = vecs.shape[1]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    emb.count()

    truths = [brute_truth(vecs, q, k) for q in qvecs]
    out: dict[str, dict] = {}
    for n_probe in probes:
        hits, t0 = 0, time.perf_counter()
        for q, truth in zip(qvecs, truths):
            qdf = spark.createDataFrame(
                [([float(x) for x in q],)], "embedding array<double>"
            )
            got = {
                r.vec_id
                for r in ivf_topk(
                    emb, qdf, k=k, n_cells=n_cells,
                    n_probe=n_probe, dim=dim,
                ).collect()
            }
            hits += len(got & set(truth))
        out[str(n_probe)] = {
            "recall_at_k": round(hits / (k * len(truths)), 4),
            "scan_frac": round(n_probe / n_cells, 4),
            "avg_query_s": round(
                (time.perf_counter() - t0) / len(truths), 3
            ),
        }
    emb.unpersist()
    return {"k": k, "n_cells": n_cells, "n_queries": len(qvecs),
            "probes": out}


def main() -> None:
    import argparse
    import json
    import os
    import sys

    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=50_000)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--queries", type=int, default=20)
    parser.add_argument("--seed", type=int, default=11)
    args = parser.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("ann-recall-bench")
    spark.sparkContext.setLogLevel("ERROR")
    vecs, qvecs = make_blob_corpus(
        n=args.n, dim=args.dim, queries=args.queries, seed=args.seed
    )
    report = measure(spark, vecs, qvecs)
    report["n_vectors"] = args.n
    report["dim"] = args.dim
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
