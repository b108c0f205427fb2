"""Exact substring dedup with removal semantics (operators/
substrdedup.py — the Lee et al. 2022 ExactSubstr tier). Pinned on
constructed corpora: cross-doc keep-first span removal, within-doc
repeats, the keeper-protection rule under self-overlap, sub-k spans
untouched, merge-adjacent via position marking, lossless
reconstruction, and the paragraph-boundary-straddling case paradedup
structurally misses. The fixture-corpus behavior is covered by
q_substring_dedup's DuckDB oracle (tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.substrdedup import (
    dedup_substrings,
)


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_substrings(df, k=k).orderBy("doc_id").collect()
    return {r.doc_id: r for r in out}


def test_cross_doc_span_removed_keep_first(spark):
    got = _run(spark, [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e f g h z"),
    ], k=4)
    assert got[1].text == "a b c d e f g h"
    assert (got[1].n_kept, got[1].n_dropped) == (8, 0)
    # doc 2: the whole shared 8-token span goes (overlapping windows
    # merged into one maximal span), surrounding context survives
    assert got[2].text == "x y z"
    assert (got[2].n_kept, got[2].n_dropped) == (3, 8)


def test_keep_first_is_by_doc_then_pos(spark):
    # same span in docs 5 and 9 -> doc 5 is the keeper
    got = _run(spark, [
        (9, "a b c d e f"),
        (5, "p p a b c d e f"),
    ], k=4)
    assert got[5].text == "p p a b c d e f"
    assert got[9].text == ""
    assert got[9].n_dropped == 6


def test_within_doc_repeat_keeps_one_copy(spark):
    got = _run(spark, [
        (1, "a b c d Z a b c d"),
    ], k=4)
    assert got[1].text == "a b c d Z"
    assert (got[1].n_kept, got[1].n_dropped) == (5, 4)


def test_self_overlapping_periodic_run_keeps_exactly_k(spark):
    # "x"*10: every window identical; the keeper window (pos 0)
    # protects its k tokens, everything past it is removed
    got = _run(spark, [(1, " ".join(["x"] * 10))], k=4)
    assert got[1].text == "x x x x"
    assert (got[1].n_kept, got[1].n_dropped) == (4, 6)


def test_duplicated_span_shorter_than_k_untouched(spark):
    got = _run(spark, [
        (1, "a b c q1 q2 q3 q4 q5"),
        (2, "a b c r1 r2 r3 r4 r5"),
    ], k=4)
    assert got[1].text == "a b c q1 q2 q3 q4 q5"
    assert got[2].text == "a b c r1 r2 r3 r4 r5"


def test_exact_copy_document_empties_later_copy(spark):
    text = "one two three four five six"
    got = _run(spark, [(1, text), (2, text)], k=4)
    assert got[1].text == text
    assert got[2].text == ""
    assert (got[2].n_kept, got[2].n_dropped) == (0, 6)


def test_two_disjoint_shared_spans_both_removed(spark):
    got = _run(spark, [
        (1, "a b c d e"),
        (2, "v w x y z"),
        (3, "a b c d e GAP1 GAP2 v w x y z"),
    ], k=5)
    assert got[3].text == "GAP1 GAP2"
    assert got[3].n_dropped == 10


def test_span_straddling_paragraph_boundary(spark):
    # the duplicated span crosses a '\n\n' boundary: paradedup's
    # structural cut can never remove it, this tier does.  Tokens are
    # literal-space pieces, so 'd\n\ne' is one token — identity holds.
    got = _run(spark, [
        (1, "a b c d\n\ne f g h"),
        (2, "Q R a b c d\n\ne f g h S"),
    ], k=4)
    assert got[1].text == "a b c d\n\ne f g h"
    assert got[2].text == "Q R S"


def test_lossless_reconstruction_without_duplicates(spark):
    # double spaces, tabs, newlines inside tokens: split-on-' ' /
    # join-with-' ' is the identity for any input
    rows = [
        (1, "plain words here no dups"),
        (2, "double  space\tand\ttabs"),
        (3, "line\nbreaks stay\n\nintact"),
        (4, ""),
    ]
    got = _run(spark, rows, k=3)
    for doc_id, text in rows:
        assert got[doc_id].text == text
        assert got[doc_id].n_dropped == 0


def test_null_text_passes_through(spark):
    got = _run(spark, [(1, None), (2, "a b c d")], k=3)
    assert got[1].text == ""
    assert (got[1].n_kept, got[1].n_dropped) == (0, 0)
    assert got[2].text == "a b c d"


def test_doc_shorter_than_k_never_forms_windows(spark):
    got = _run(spark, [(1, "a b"), (2, "a b"), (3, "a b c")], k=4)
    assert got[1].text == "a b" and got[2].text == "a b"
    assert got[3].text == "a b c"


def test_k_validation():
    with pytest.raises(ValueError, match="k must be >= 2"):
        dedup_substrings(None, k=1)


def test_token_conservation(spark):
    # n_kept + n_dropped == original token count, every doc
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e f g h z"),
        (3, " ".join(["x"] * 10)),
        (4, "unique words only right here"),
    ]
    got = _run(spark, rows, k=4)
    for doc_id, text in rows:
        n = len(text.split(" "))
        assert got[doc_id].n_kept + got[doc_id].n_dropped == n


def test_window_hash_tiers_agree_and_auto_escalates(spark):
    """r15 (r14 VERDICT #5): the xxhash128 composite tier marks the
    same windows as the 64-bit tier absent collisions (output
    identical on a corpus with real cross-doc duplication), and the
    "auto" default escalates to it above the plan-size gate — a
    collision in the 64-bit tier would falsely REMOVE real text at
    10^13+ windows, so the gate must flip well before that."""
    import web3_flight_rpc_server_spark.operators.substrdedup as sd

    base = [f"w{i}" for i in range(60)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(["x%d" % i for i in range(25)] + base[:30])),
        (3, " ".join(base[10:40] + ["y%d" % i for i in range(20)])),
        (4, None),
        (5, "short doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out64 = sorted(map(tuple, sd.dedup_substrings(
        docs, k=20, window_hash="xxhash64").collect()))
    out128 = sorted(map(tuple, sd.dedup_substrings(
        docs, k=20, window_hash="xxhash128").collect()))
    outmd5 = sorted(map(tuple, sd.dedup_substrings(
        docs, k=20, window_hash="md5").collect()))
    assert out64 == out128 == outmd5
    # the composite tier really carries two key channels
    occ_plan = sd.dedup_substrings(
        docs, k=20, window_hash="xxhash128"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "h2" in occ_plan
    # auto gate: needs a source with REAL size stats (a LocalRelation
    # reports Long.Max = unknown, which auto conservatively escalates;
    # production corpora are file-backed). Below the gate -> 64-bit
    # (no h2); with the gate floored -> composite; output invariant.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(td)
        pq = spark.read.parquet(td)
        auto_small = sd.dedup_substrings(
            pq, k=20)._jdf.queryExecution().optimizedPlan().toString()
        assert "h2" not in auto_small
        prev = sd._X128_MIN_BYTES
        sd._X128_MIN_BYTES = 0
        try:
            auto_big = sd.dedup_substrings(
                pq, k=20
            )._jdf.queryExecution().optimizedPlan().toString()
            assert "h2" in auto_big
            out_auto = sorted(map(tuple, sd.dedup_substrings(
                pq, k=20).collect()))
            assert out_auto == out64
        finally:
            sd._X128_MIN_BYTES = prev
