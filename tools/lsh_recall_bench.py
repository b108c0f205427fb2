"""Recall-measured end-to-end LSH dedup benchmark (VERDICT r4 #8).

The banding math in operators/dedup.py documents expected pair recall
p(J) = 1 - (1 - J^r)^b for the default 32-hash / 8-band / r=4 layout.
This harness turns that formula into a MEASURED number: it plants
near-dup pairs at several target Jaccard levels inside a synthetic
corpus, runs the production MinHash-LSH tier end-to-end, and reports
per-level recall against the planted truth plus overall precision.

Corpus construction: documents are token sequences drawn from a
shared vocabulary (so background pairs have small nonzero overlap and
band collisions CAN occur by chance — precision is a real
measurement, not vacuous). A planted pair (A, B) shares its first m
tokens and diverges after: with distinct-shingle sets of equal size
s = T - n + 1, shared = m - n + 1, the 3-gram Jaccard is
(m-2) / (2(T-2) - (m-2)) — solved for m per target level. The
ACHIEVED Jaccard of every planted pair is recomputed exactly in
Python (shared-vocab draws can nudge it), and recall is reported
against pairs whose achieved J clears the pipeline threshold.

Run standalone for the scale measurement (writes one JSON line):

    python tools/lsh_recall_bench.py [--background 50000] \
        [--pairs-per-level 200] [--seed 7]

tests/test_lsh_recall.py runs the same harness at a small size with
statistical floors under the theoretical curve.
"""

from __future__ import annotations

import random

SHINGLE_N = 3
DEFAULT_LEVELS = (0.9, 0.8, 0.7, 0.5, 0.3)


def theoretical_recall(j: float, num_hashes: int = 32, bands: int = 8) -> float:
    r = num_hashes // bands
    return 1.0 - (1.0 - j ** r) ** bands


def _shingles(toks: list[str]) -> set[tuple[str, ...]]:
    return {
        tuple(toks[i:i + SHINGLE_N])
        for i in range(len(toks) - SHINGLE_N + 1)
    }


def _jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _prefix_len_for(j: float, t: int) -> int:
    """Tokens to share so the 3-gram Jaccard of two t-token docs whose
    suffixes are disjoint lands at ~j: shared shingles m-2 out of
    2(t-2) - (m-2) total."""
    s = t - SHINGLE_N + 1  # shingles per doc
    shared = 2.0 * j * s / (1.0 + j)
    return max(SHINGLE_N, min(t - 1, round(shared + SHINGLE_N - 1)))


def make_planted_corpus(n_background: int = 2000,
                        pairs_per_level: int = 100,
                        levels: tuple[float, ...] = DEFAULT_LEVELS,
                        doc_tokens: int = 60,
                        vocab_size: int = 10_000,
                        seed: int = 7):
    """Returns (rows, truth): ``rows`` is [(doc_id, text)], ``truth``
    maps (d1, d2) -> (target_level, achieved_jaccard) for every
    planted pair. Background docs are independent draws; planted pair
    members live at ids >= 10^6 so they can't collide with background
    ids."""
    rng = random.Random(seed)
    vocab = [f"tok{v}" for v in range(vocab_size)]

    def draw(n: int) -> list[str]:
        return [vocab[rng.randrange(vocab_size)] for _ in range(n)]

    rows = [(i, " ".join(draw(doc_tokens))) for i in range(n_background)]
    truth: dict[tuple[int, int], tuple[float, float]] = {}
    nid = 1_000_000
    for level in levels:
        m = _prefix_len_for(level, doc_tokens)
        for _ in range(pairs_per_level):
            a = draw(doc_tokens)
            b = a[:m] + draw(doc_tokens - m)
            d1, d2 = nid, nid + 1
            nid += 2
            rows.append((d1, " ".join(a)))
            rows.append((d2, " ".join(b)))
            truth[(d1, d2)] = (level, _jaccard(a, b))
    return rows, truth


def measure(spark, rows, truth, threshold: float = 0.25,
            num_hashes: int = 32, bands: int = 8,
            max_bucket: int | None = 5000) -> dict:
    """Run the production LSH tier over the planted corpus and score
    it. Returns {"levels": {level: {planted, eligible, found, recall,
    theory}}, "precision": float, "false_positives": int}.

    ``eligible`` counts planted pairs whose ACHIEVED exact Jaccard
    clears ``threshold`` (the pipeline cannot and should not report
    the rest); recall is found/eligible. Precision audits every
    reported pair: planted pairs are true positives, and any OTHER
    reported pair must carry a verified exact Jaccard >= threshold —
    exact verification makes sub-threshold reports impossible by
    construction, so false_positives counts pipeline bugs, not LSH
    luck."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        release_caches,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.d1, r.d2): r.jaccard
        for r in minhash_lsh_dedup_pairs(
            docs, threshold=threshold, num_hashes=num_hashes,
            bands=bands, max_bucket=max_bucket,
        ).collect()
    }
    release_caches()

    levels: dict[float, dict] = {}
    for pair, (level, achieved) in truth.items():
        lv = levels.setdefault(level, {
            "planted": 0, "eligible": 0, "found": 0,
            "theory": round(theoretical_recall(level, num_hashes, bands), 4),
        })
        lv["planted"] += 1
        if achieved >= threshold:
            lv["eligible"] += 1
            if pair in found:
                lv["found"] += 1
    for lv in levels.values():
        lv["recall"] = (
            round(lv["found"] / lv["eligible"], 4) if lv["eligible"] else None
        )

    extras = [p for p in found if p not in truth]
    false_pos = sum(1 for p in extras if found[p] < threshold)
    n_true = len(found) - false_pos
    return {
        "levels": {str(k): v for k, v in sorted(levels.items())},
        "reported_pairs": len(found),
        "unplanted_true_pairs": len(extras) - false_pos,
        "false_positives": false_pos,
        "precision": round(n_true / len(found), 6) if found else 1.0,
    }


def main() -> None:
    import argparse
    import json
    import sys
    import time

    parser = argparse.ArgumentParser()
    parser.add_argument("--background", type=int, default=50_000)
    parser.add_argument("--pairs-per-level", type=int, default=200)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("lsh-recall-bench")
    spark.sparkContext.setLogLevel("ERROR")
    rows, truth = make_planted_corpus(
        n_background=args.background, pairs_per_level=args.pairs_per_level,
        seed=args.seed,
    )
    t0 = time.perf_counter()
    report = measure(spark, rows, truth)
    report["wall_s"] = round(time.perf_counter() - t0, 2)
    report["n_docs"] = len(rows)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
