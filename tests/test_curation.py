"""End-to-end curation pipeline (pipelines/curation.py): funnel
accounting must partition the corpus, survivors must pass every gate,
and the written layout must shard by split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.pipelines.curation import (
    REJECT_ORDER,
    CurationConfig,
    curate,
)
from web3_flight_rpc_server_spark.sources import tables


def test_curation_funnel_partitions_corpus(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    cfg = CurationConfig(n_splits=4)  # wide val bucket: sf0.001 keeps few docs
    curated, stats = curate(spark, sf_dir, out_dir=out, cfg=cfg)
    total = tables.load_table(spark, sf_dir, "documents").count()
    ledger = {r.stage: r.n_docs for r in stats.collect()}

    # every doc lands in exactly one funnel stage
    assert sum(ledger.values()) == total
    assert set(ledger) <= {"kept"} | set(REJECT_ORDER)
    assert ledger.get("kept", 0) > 0
    # the synthetic corpus exercises every gate that has matter at
    # this sf: non-en docs exist, dups are injected, blocklist words
    # appear
    assert ledger.get("lang", 0) > 0
    assert ledger.get("exact_dup", 0) + ledger.get("near_dup", 0) > 0

    rows = curated.collect()
    assert len(rows) == ledger["kept"]
    # survivors pass the expression gates...
    assert all(r.quality >= cfg.min_quality for r in rows)
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts)), "exact dups must not survive"
    blocked = {w for r in rows for w in r.text.lower().split() if w in cfg.blocklist}
    assert not blocked, f"blocklist tokens survived: {blocked}"
    # ...and both split values exist with the md5-deterministic shape
    splits = {r.split for r in rows}
    assert splits == {"train", "val"}

    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val"}
    back = spark.read.parquet(out)
    assert back.count() == ledger["kept"]


def test_curation_rejects_are_first_failing_gate(spark, sf_dir):
    """A doc failing an early gate must not be charged to a later one:
    reject doc_ids are unique across stages."""
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    rejects = curation_rejects(docs).collect()
    ids = [r.doc_id for r in rejects]
    assert len(ids) == len(set(ids)), "doc charged to multiple stages"
    assert {r.reject_reason for r in rejects} <= set(REJECT_ORDER)


def test_lsh_and_exact_funnels_agree_on_kept_set(spark, sf_dir):
    """The production near-dup tier (MinHash-LSH, pairs_fn=None) and
    the oracle-friendly exact-Jaccard tier (what q_curation_funnel
    declares) must route every document identically at fixture scale:
    LSH candidates are exact-verified before rejecting, so any
    divergence means the banding missed a true >=threshold pair. This
    pins the driver-attested artifact to the 100 TB code path."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_caches,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    try:
        exact = {
            (r.doc_id, r.reject_reason)
            for r in curation_rejects(
                docs, pairs_fn=lambda d: ngram_jaccard_pairs(d, threshold=0.3)
            ).collect()
        }
        lsh = {
            (r.doc_id, r.reject_reason)
            for r in curation_rejects(docs, pairs_fn=None).collect()
        }
    finally:
        release_caches()
    assert lsh == exact
    assert any(reason == "near_dup" for _, reason in exact), (
        "parity is vacuous unless the near-dup gate fires at this sf"
    )
