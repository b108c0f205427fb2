"""Token-id-space chunking (operators/chunking.py:chunk_token_ids):
the windowing arithmetic must mirror the text chunker exactly and
cover every id."""

from __future__ import annotations


def test_chunk_token_ids_covers_every_id(spark):
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.operators.chunking import (
        chunk_token_ids,
    )

    rows = [
        (1, list(range(23))),   # multiple windows
        (2, list(range(5))),    # single short window
        (3, []),                # empty -> one empty chunk
        (4, None),              # null -> no chunks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, token_ids array<long>")
    out = chunk_token_ids(docs, max_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc
    assert [len(r.chunk_ids) for r in by_doc[3]] == [0]
    for doc_id, ids in ((1, list(range(23))), (2, list(range(5)))):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # stride = 6: window i starts at 6*i
        seen = set()
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert list(c.chunk_ids) == ids[6 * i: 6 * i + 8]
            assert c.n_tokens == len(c.chunk_ids)
            seen.update(c.chunk_ids)
        assert seen == set(ids), doc_id


def test_chunk_token_ids_equals_text_chunker_on_numeric_corpus(spark):
    """Feed the TEXT chunker a corpus whose whitespace tokens are the
    decimal ids: both chunkers must produce identical windows."""
    from web3_flight_rpc_server_spark.operators.chunking import (
        chunk_documents,
        chunk_token_ids,
    )

    ids = [list(range(40)), list(range(7)), list(range(17))]
    docs_ids = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ids)],
        "doc_id long, token_ids array<long>",
    )
    docs_txt = spark.createDataFrame(
        [(i, " ".join(map(str, v))) for i, v in enumerate(ids)],
        "doc_id long, text string",
    )
    a = {
        (r.doc_id, r.chunk_idx): [int(x) for x in r.chunk_ids]
        for r in chunk_token_ids(docs_ids, max_tokens=10,
                                 overlap=3).collect()
    }
    b = {
        (r.doc_id, r.chunk_idx): (
            [int(x) for x in r.chunk_text.split(" ")]
            if r.chunk_text else []
        )
        for r in chunk_documents(docs_txt, max_tokens=10,
                                 overlap=3).collect()
    }
    assert a == b
