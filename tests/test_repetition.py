"""q_repetition semantics on hand-built documents: the Gopher
repeated-bigram metrics are checked against hand-computed values,
including the deterministic modal-bigram tie-break and the
short-document exclusion."""

from __future__ import annotations

from web3_flight_rpc_server_spark.queries.text import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_hand_computed(spark):
    # "a b a b a": bigrams = [a b, b a, a b, b a] -> 4 total,
    # 2 distinct, modal count 2, every occurrence duplicated.
    out = repetition_stats(
        _docs(spark, [(1, "a b a b a")])
    ).collect()[0]
    assert out.n_bigrams == 4
    assert out.n_distinct_bigrams == 2
    assert out.top_count == 2
    # tie at count 2: deterministic winner is the lexicographically
    # largest bigram ("b a" > "a b")
    assert out.top_bigram == "b a"
    assert out.dup_bigrams == 4
    assert out.dup_bigram_frac == 1.0
    # 2 occurrences x len("b a")=3 chars / 9 chars = 0.6667
    assert out.top_bigram_char_frac == 0.6667


def test_repetition_all_unique_bigrams(spark):
    out = repetition_stats(
        _docs(spark, [(7, "w x y z")])
    ).collect()[0]
    assert out.n_bigrams == 3
    assert out.n_distinct_bigrams == 3
    assert out.top_count == 1
    assert out.dup_bigrams == 0
    assert out.dup_bigram_frac == 0.0


def test_repetition_excludes_sub_bigram_docs(spark):
    # single-token and empty docs produce no bigram rows at all
    out = repetition_stats(
        _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
    ).collect()
    assert [r.doc_id for r in out] == [3]
