"""Paragraph-level exact dedup (operators/paradedup.py) on
constructed multi-paragraph corpora — the fixture corpus is
single-paragraph (q_paragraph_dedup documents the caveat), so the
real semantics are pinned here."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.operators.paradedup import (
    dedup_paragraphs,
)

BOILER = "this legal boilerplate paragraph repeats on every page"
NAV = "home | about | contact"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"{BOILER}\n\nunique first body text\n\n{NAV}"),
        (2, f"{BOILER}\n\nanother distinct body paragraph\n\n{NAV}"),
        (3, f"{BOILER}\n\n{BOILER}"),         # only dups -> empties
        (4, "short\n\nx\n\nshort"),           # all under min_chars
        (5, None),                            # null text
        (6, "unique first body text"),        # dup of doc 1's body
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def out(docs):
    return {
        r.doc_id: r
        for r in dedup_paragraphs(docs, sep="\n\n", min_chars=6).collect()
    }


def test_keep_first_occurrence_globally(out):
    # doc 1 (lowest id) keeps boilerplate + body + nav intact
    assert out[1].text == f"{BOILER}\n\nunique first body text\n\n{NAV}"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 0)
    # doc 2 loses boilerplate and nav (both seen first in doc 1),
    # keeps its own body, order preserved
    assert out[2].text == "another distinct body paragraph"
    assert (out[2].n_kept, out[2].n_dropped) == (1, 2)
    # doc 6's body was doc 1's paragraph -> emptied
    assert out[6].text == ""
    assert (out[6].n_kept, out[6].n_dropped) == (0, 1)


def test_within_doc_repeats_also_dedup(out):
    # doc 3: first copy already kept by doc 1; both of its own go
    assert out[3].text == ""
    assert (out[3].n_kept, out[3].n_dropped) == (0, 2)


def test_short_paragraphs_are_exempt(out):
    # every paragraph under min_chars survives, repeats included
    assert out[4].text == "short\n\nx\n\nshort"
    assert (out[4].n_kept, out[4].n_dropped) == (3, 0)


def test_null_text_passes_with_empty_result(out):
    assert out[5].text == ""
    assert (out[5].n_kept, out[5].n_dropped) == (0, 0)


def test_regex_separators_split_literally(spark):
    docs = spark.createDataFrame(
        [(1, "alpha body text. alpha body text"), (2, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in dedup_paragraphs(docs, sep=". ", min_chars=4).collect()
    }
    # "." must not act as regex-any: exactly two paragraphs, second
    # drops as a dup of the first
    assert got[1].text == "alpha body text"
    assert (got[1].n_kept, got[1].n_dropped) == (1, 1)


def test_rejects_negative_min_chars(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_chars"):
        dedup_paragraphs(docs, min_chars=-1)
