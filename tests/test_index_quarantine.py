"""Persistent hot-bucket quarantine for the incremental MinHash index.

The one-shot tier's max_bucket (tests/test_hot_buckets.py) protects a
single job; the INDEX is where the hazard compounds — an indexed
template bucket of m docs costs every future probe O(m) candidates
forever. The index maintains per-append (band, bucket) population
deltas, probes exclude over-cap buckets via a broadcast anti-join, and
the ledger is exact and replay-proof.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.incremental import (
    _read_manifest,
    dedup_against_index,
    index_bucket_populations,
    index_hot_buckets,
    write_minhash_index,
)

TEMPLATE = (
    "terms of service boilerplate page all rights reserved contact "
    "us privacy policy cookie notice copyright two thousand twenty"
)
UNIQUE = (
    "a genuinely distinct document about columnar engines and "
    "vectorized execution with adaptive shuffle planning at runtime"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_excludes_hot_buckets_and_ledger_is_exact(spark, tmp_path):
    path = str(tmp_path / "idx")
    corpus = [(i, f"{TEMPLATE} serial {i % 2}") for i in range(50)]
    corpus += [(1000, UNIQUE)]
    write_minhash_index(_docs(spark, corpus), path, max_bucket=20)

    # ledger: template docs (two variants x ~25 docs) concentrate in
    # few buckets; every listed bucket's population exceeds the cap
    # and matches an exact recount of the bands dataset
    hot = index_hot_buckets(spark, path)
    assert hot.count() > 0
    assert hot.where(F.col("n_docs") <= 20).count() == 0
    import os

    bands = spark.read.parquet(os.path.join(path, "bands"))
    recount = {
        (r.band, r.bucket): r.n
        for r in bands.groupBy("band", "bucket").agg(
            F.count("*").alias("n")
        ).collect()
    }
    for r in index_bucket_populations(spark, path).collect():
        assert recount[(r.band, r.bucket)] == r.n_docs

    # a probe near-identical to the distinct doc still hits...
    hit = dedup_against_index(
        _docs(spark, [(2000, UNIQUE + " extra")]), path, threshold=0.5
    ).collect()
    assert any(r.idx_id == 1000 for r in hit)
    # ...while a template probe is quarantined out (documented recall
    # trade: the operator audits the ledger instead of paying O(m)
    # candidates per probe forever)
    tmpl_hits = dedup_against_index(
        _docs(spark, [(3000, f"{TEMPLATE} serial 0")]), path, threshold=0.5
    ).collect()
    assert tmpl_hits == []


def test_populations_accumulate_across_appends_and_cap_kicks_in(
    spark, tmp_path
):
    path = str(tmp_path / "idx")
    first = [(i, f"{TEMPLATE} serial x") for i in range(15)]
    write_minhash_index(_docs(spark, first), path, max_bucket=20)
    # under the cap: a template probe matches
    assert dedup_against_index(
        _docs(spark, [(900, f"{TEMPLATE} serial x")]), path, threshold=0.9
    ).count() > 0
    assert index_hot_buckets(spark, path).count() == 0

    second = [(100 + i, f"{TEMPLATE} serial x") for i in range(15)]
    write_minhash_index(_docs(spark, second), path, append=True)
    # 30 identical docs now share every band bucket: over the cap
    assert index_hot_buckets(spark, path).count() > 0
    assert dedup_against_index(
        _docs(spark, [(901, f"{TEMPLATE} serial x")]), path, threshold=0.9
    ).count() == 0


def test_replayed_append_does_not_inflate_populations(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = [(i, f"{UNIQUE} variant {i}") for i in range(10)]
    write_minhash_index(_docs(spark, docs), path, max_bucket=100)
    batch = [(100 + i, f"{TEMPLATE} copy {i}") for i in range(5)]
    write_minhash_index(_docs(spark, batch), path, append=True)

    def pops():
        return {
            (r.band, r.bucket): r.n_docs
            for r in index_bucket_populations(spark, path).collect()
        }

    before = pops()
    # crash-replay: the same batch appends again; the idempotent-
    # append exclusion drops every row, so the deltas must be empty
    write_minhash_index(_docs(spark, batch), path, append=True)
    assert pops() == before


def test_cap_is_manifest_pinned_and_compaction_preserves_it(
    spark, tmp_path
):
    from web3_flight_rpc_server_spark.operators.incremental import (
        compact_index,
    )

    path = str(tmp_path / "idx")
    write_minhash_index(
        _docs(spark, [(i, f"{TEMPLATE} v{i % 3}") for i in range(30)]),
        path, max_bucket=8,
    )
    # append cannot loosen the cap: the manifest wins
    write_minhash_index(
        _docs(spark, [(500, UNIQUE)]), path, append=True, max_bucket=10_000
    )
    assert _read_manifest(spark, path).max_bucket == 8

    before = {
        (r.band, r.bucket, r.n_docs)
        for r in index_hot_buckets(spark, path).collect()
    }
    assert before
    compact_index(spark, path)
    after = {
        (r.band, r.bucket, r.n_docs)
        for r in index_hot_buckets(spark, path).collect()
    }
    assert after == before
    # folded to one row per bucket
    stats = spark.read.parquet(str(tmp_path / "idx" / "bucket_stats"))
    assert stats.groupBy("band", "bucket").count().where(
        F.col("count") > 1
    ).count() == 0


def test_uncapped_index_has_no_stats_surface(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_minhash_index(
        _docs(spark, [(1, UNIQUE), (2, TEMPLATE)]), path
    )
    with pytest.raises(ValueError, match="without max_bucket"):
        index_hot_buckets(spark, path)
    # probes on an uncapped index run the r4 path untouched
    assert dedup_against_index(
        _docs(spark, [(9, UNIQUE + " tail")]), path, threshold=0.5
    ).count() > 0


def test_stats_crash_window_detected_and_rebuilt(spark, tmp_path):
    """The bands append and its bucket_stats delta are two writes; a
    crash between them loses the delta forever (the replay exclusion
    removes the already-present ids before the delta recomputes —
    advisor r5). verify_bucket_stats must detect the undercount and
    rebuild_bucket_stats must restore exact populations from the
    bands dataset."""
    import os

    from web3_flight_rpc_server_spark.operators.dedup import (
        agg_signatures,
        banded_signatures,
        shingle_sets,
    )
    from web3_flight_rpc_server_spark.operators.incremental import (
        rebuild_bucket_stats,
        verify_bucket_stats,
    )

    path = str(tmp_path / "idx")
    docs = [(i, f"{UNIQUE} variant {i}") for i in range(8)]
    write_minhash_index(_docs(spark, docs), path, max_bucket=100)
    assert verify_bucket_stats(spark, path)

    # simulate the crashed append: the new doc's banded rows land in
    # bands/ but the process dies before the stats delta is written
    crashed = _docs(spark, [(999, f"{TEMPLATE} crashed append")])
    banded_signatures(
        agg_signatures(shingle_sets(crashed))
    ).write.mode("append").parquet(os.path.join(path, "bands"))

    assert not verify_bucket_stats(spark, path)
    rebuild_bucket_stats(spark, path)
    assert verify_bucket_stats(spark, path)

    bands = spark.read.parquet(os.path.join(path, "bands"))
    recount = {
        (r.band, r.bucket): r.n
        for r in bands.groupBy("band", "bucket").agg(
            F.count("*").alias("n")
        ).collect()
    }
    folded = {
        (r.band, r.bucket): r.n_docs
        for r in index_bucket_populations(spark, path).collect()
    }
    assert folded == recount


def test_streaming_ingest_bootstraps_and_enforces_cap(spark, tmp_path):
    """The streaming ingest loop carries the cap end-to-end. The
    corpus shape matters: detectable near-dups never accumulate (the
    dedup loop rejects them), so the quarantine exists for
    SUB-THRESHOLD templates — docs similar enough to share band
    buckets (J ~ 0.94, per-band collision ~0.78) but below the dedup
    threshold (0.98), which stay admitted forever and pile into the
    same buckets. The bootstrap records max_bucket in the manifest,
    populations accumulate across micro-batches, and the ledger
    reports the over-cap buckets."""
    from web3_flight_rpc_server_spark.operators.incremental import (
        streaming_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "idx")
    kept_batches = []

    words = [f"w{j}" for j in range(100)]

    def doc(i):
        # every doc changes THE SAME position to a doc-unique token:
        # pairwise shingle Jaccard ~ 95/101 ~ 0.94 for all pairs
        toks = list(words)
        toks[50] = f"x{i}"
        return " ".join(toks)

    def drop(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    drop("b1", [(i, doc(i)) for i in range(6)])
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = streaming_ingest(
        stream, path, str(tmp_path / "ckpt"),
        threshold=0.98, max_bucket=8,
        on_kept=lambda df, bid: kept_batches.append(
            {r.doc_id for r in df.collect()}
        ),
    )
    try:
        q.processAllAvailable()
        assert _read_manifest(spark, path).max_bucket == 8
        # sub-threshold: every template variant is admitted
        assert set().union(*kept_batches) == set(range(6))
        assert index_hot_buckets(spark, path).count() == 0

        drop("b2", [(100 + i, doc(100 + i)) for i in range(12)])
        q.processAllAvailable()
    finally:
        q.stop()

    assert set().union(*kept_batches) >= {100 + i for i in range(12)}
    hot = index_hot_buckets(spark, path)
    # populations accumulated across micro-batches and crossed the cap
    assert hot.count() > 0
    assert hot.where(F.col("n_docs") <= 8).count() == 0
