"""Measured IVF recall vs probe depth (tools/ann_recall_bench.py).

Floors are deliberately loose (blob geometry vs 16 fixed pseudo-random
anchors varies by seed); the shape claims are what matter: full probe
is ~exact, recall rises with probe depth, and a partial probe on
clustered data already recovers most neighbors while scanning a
fraction of the corpus.
"""

from __future__ import annotations

from tools.ann_recall_bench import make_blob_corpus, measure


def test_ivf_recall_rises_with_probe_depth(spark):
    vecs, qvecs = make_blob_corpus(n=5000, dim=16, queries=8, seed=11)
    report = measure(spark, vecs, qvecs, k=10, n_cells=16,
                     probes=(1, 4, 16))
    r = {p: report["probes"][str(p)]["recall_at_k"] for p in (1, 4, 16)}
    # probing every cell scans everything: exact modulo float ties
    assert r[16] >= 0.99
    # monotone within a small tolerance band
    assert r[4] <= r[16] + 1e-9
    assert r[1] <= r[4] + 0.05
    # clustered data: a quarter of the cells recovers most neighbors
    assert r[4] >= 0.6
    # and the knob is real — probing 1 of 16 cells must lose recall
    # vs exact (otherwise the harness degenerated)
    assert r[1] < 1.0
