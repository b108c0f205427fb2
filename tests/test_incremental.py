"""Incremental dedup against a persisted MinHash index
(operators/incremental.py) — parity with the one-shot pipeline and the
ingest loop's admit/reject behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.dedup import (
    minhash_lsh_dedup_pairs,
    release_caches,
)
from web3_flight_rpc_server_spark.operators.incremental import (
    dedup_against_index,
    ingest_batch,
    write_minhash_index,
)
from web3_flight_rpc_server_spark.sources import tables


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _split(spark, sf_dir, cut=25):
    docs = tables.load_table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < cut), docs.where(F.col("doc_id") >= cut)


def test_index_probe_matches_one_shot_cross_pairs(spark, sf_dir, tmp_path):
    """Probing a new batch against an indexed corpus must find exactly
    the one-shot pipeline's pairs that cross the split — same
    signatures, same buckets, same exact verification."""
    old, new = _split(spark, sf_dir)
    docs = tables.load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "idx")
    write_minhash_index(old, path)

    got = {
        (r.new_id, r.idx_id, round(r.jaccard, 6))
        for r in dedup_against_index(new, path, threshold=0.3).collect()
    }
    cut = 25
    want = {
        (r.d2, r.d1, round(r.jaccard, 6))
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.3).collect()
        if r.d1 < cut <= r.d2
    }
    assert got == want


def test_index_append_extends_probe_surface(spark, sf_dir, tmp_path):
    """Appending a batch to the index makes LATER probes collide with
    it: an exact copy of an appended doc must be caught."""
    old, new = _split(spark, sf_dir)
    path = str(tmp_path / "idx")
    write_minhash_index(old, path)
    write_minhash_index(new, path, append=True)

    copy = new.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    src_id = new.limit(1).collect()[0].doc_id
    hits = dedup_against_index(copy, path, threshold=0.99).collect()
    assert any(r.idx_id == src_id and r.jaccard == 1.0 for r in hits)


def test_ingest_batch_rejects_dups_admits_novel(spark, sf_dir, tmp_path):
    old, _ = _split(spark, sf_dir)
    path = str(tmp_path / "idx")
    write_minhash_index(old, path)

    dup = old.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [
            (200001, "zymurgy quixotic fjord waltz blitz nymph vexing jigsaw"),
            (200002, "glyph sphinx quartz vodka jackdaws bumf klutz wyvern"),
        ],
        "doc_id long, text string",
    )
    batch = dup.unionByName(novel)
    kept_ids = {r.doc_id for r in ingest_batch(batch, path, 0.5).collect()}
    assert kept_ids == {200001, 200002}

    # the admitted docs are now indexed: replaying one of them is a dup
    replay = novel.limit(1).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    hits = dedup_against_index(replay, path, threshold=0.99).collect()
    assert {r.idx_id for r in hits} == {200001}


def test_probe_requires_existing_index(spark, sf_dir, tmp_path):
    _, new = _split(spark, sf_dir)
    with pytest.raises(FileNotFoundError):
        dedup_against_index(new, str(tmp_path / "missing"))


def test_manifest_pins_layout(spark, sf_dir, tmp_path):
    """Probes band with the manifest's parameters (a 16-band index
    still collides with a default-parameter probe call), and appends
    with a conflicting layout are refused instead of silently
    never-colliding."""
    old, new = _split(spark, sf_dir)
    path = str(tmp_path / "idx16")
    write_minhash_index(old, path, bands=16)

    copy = old.limit(1).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    src_id = old.limit(1).collect()[0].doc_id
    hits = dedup_against_index(copy, path, threshold=0.99).collect()
    assert any(r.idx_id == src_id and r.jaccard == 1.0 for r in hits)

    with pytest.raises(ValueError, match="rebanding"):
        write_minhash_index(new, path, bands=8, append=True)


def test_streaming_ingest_loop(spark, sf_dir, tmp_path):
    """readStream -> foreachBatch(ingest_batch): batch 2's duplicate
    of a batch-1 doc is rejected against the index the stream itself
    built; novel docs are admitted and indexed; replaying an admitted
    doc (at-least-once recovery) is rejected, so the index never gains
    duplicate entries."""
    import time

    from web3_flight_rpc_server_spark.operators.incremental import (
        streaming_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "idx")
    kept_batches = []

    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight ok"),
            (2, "a completely different sentence with other words here now"),
        ],
        "doc_id long, text string",
    )
    b1.write.mode("overwrite").parquet(str(src / "b1"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = streaming_ingest(
        stream, path, str(tmp_path / "ckpt"),
        on_kept=lambda df, bid: kept_batches.append(
            {r.doc_id for r in df.collect()}
        ),
    )
    try:
        q.processAllAvailable()
        assert set().union(*kept_batches) == {1, 2}

        b2 = spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy dog tonight ok"),
                (11, "entirely novel third document with fresh vocabulary words"),
            ],
            "doc_id long, text string",
        )
        b2.write.mode("overwrite").parquet(str(src / "b2"))
        q.processAllAvailable()
        admitted = set().union(*kept_batches)
        assert 10 not in admitted, "dup of an indexed doc must be rejected"
        assert 11 in admitted
    finally:
        q.stop()

    # simulated at-least-once replay: re-ingesting an admitted doc
    # collides with its indexed copy and adds nothing
    replay = spark.createDataFrame(
        [(11, "entirely novel third document with fresh vocabulary words")],
        "doc_id long, text string",
    )
    kept = ingest_batch(replay, path, 0.5)
    assert kept.count() == 0
    shingles = spark.read.parquet(path + "/shingles")
    assert shingles.where(F.col("doc_id") == 11).count() == 1


def test_partial_append_heals_on_replay(spark, sf_dir, tmp_path):
    """A crash between the two append writes leaves a doc with band
    rows but no shingle row; replaying the batch must COMPLETE the
    half-indexed doc without duplicating either dataset (per-dataset
    presence exclusion in write_minhash_index)."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        agg_signatures,
        banded_signatures,
        shingle_sets,
    )

    old, _ = _split(spark, sf_dir)
    path = str(tmp_path / "idx")
    write_minhash_index(old, path)

    doc = spark.createDataFrame(
        [(999, "a fresh document that crashed halfway through indexing")],
        "doc_id long, text string",
    )
    # simulate the crash: bands appended, shingles NOT
    sets = shingle_sets(doc)
    banded_signatures(agg_signatures(sets)).write.mode("append").parquet(
        path + "/bands"
    )
    n_band_rows = spark.read.parquet(path + "/bands").where(
        F.col("doc_id") == 999
    ).count()
    assert n_band_rows > 0

    kept = ingest_batch(doc, path, 0.5)
    # re-admitted (its half-indexed copy could not verify) ...
    assert {r.doc_id for r in kept.collect()} == {999}
    # ... and the index is now COMPLETE with no duplicates
    bands_after = spark.read.parquet(path + "/bands").where(
        F.col("doc_id") == 999
    ).count()
    shingles_after = spark.read.parquet(path + "/shingles").where(
        F.col("doc_id") == 999
    ).count()
    assert bands_after == n_band_rows
    assert shingles_after == 1
    # a subsequent replay is a pure duplicate: rejected, nothing grows
    kept2 = ingest_batch(doc, path, 0.5)
    assert kept2.count() == 0
    assert spark.read.parquet(path + "/bands").where(
        F.col("doc_id") == 999
    ).count() == n_band_rows


def test_bucketed_bands_tier_no_exchange_on_index_side(spark, sf_dir, tmp_path):
    """The metastore bucketed-bands tier: the probe join must shuffle
    ONLY the probe side — the bands table's pinned (band, bucket) hash
    partitioning satisfies the join's distribution requirement, so the
    plan carries no Exchange over the index scan. Also: identical
    pairs to the plain-parquet tier, and appends follow the manifest's
    tier automatically."""
    old, new = _split(spark, sf_dir)
    plain_path = str(tmp_path / "idx_plain")
    bt_path = str(tmp_path / "idx_bucketed")
    table = "test_idx_bands"
    write_minhash_index(old, plain_path)
    # broadcast off so the join planning is the SMJ-vs-bucketing
    # decision under test, not a tiny-fixture broadcast
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_minhash_index(old, bt_path, bands_table=table, buckets=8)

        probe = dedup_against_index(new, bt_path, threshold=0.3)
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Bucketed: true" in plan, "index side not read as bucketed"
        # exactly one (band, bucket) exchange: the probe side's. The
        # plain tier plans two (both join children shuffle).
        assert plan.count("hashpartitioning(band") == 1, plan
        plain_probe = dedup_against_index(new, plain_path, threshold=0.3)
        plain_plan = plain_probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert plain_plan.count("hashpartitioning(band") == 2

        got = {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in probe.collect()
        }
        want = {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in plain_probe.collect()
        }
        assert got == want and got

        # append follows the manifest's tier: the table (not a
        # path/bands directory) gains the new batch's rows
        before = spark.table(table).count()
        write_minhash_index(new, bt_path, append=True)
        assert spark.table(table).count() > before
        copy = new.limit(1).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
        src_id = new.limit(1).collect()[0].doc_id
        hits = dedup_against_index(copy, bt_path, threshold=0.99).collect()
        assert any(r.idx_id == src_id and r.jaccard == 1.0 for r in hits)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_bands_compaction_and_crash_windows(spark, sf_dir,
                                                     tmp_path):
    """In-loop metastore-swap compaction for the bands_table tier (r13
    VERDICT #1, the gap compact_index used to skip): probes are
    bit-identical across the fold, ``Bucketed: true`` and the
    one-exchange probe plan survive (the fold rewrites with the SAME
    bucket spec), the table's file count folds to <= buckets, and both
    crash windows self-heal — live dropped with tmp present (rename
    finished at the next open) and a torn tmp CTAS directory (swept,
    not wedged — r13 ADVICE)."""
    import os
    from urllib.parse import urlparse

    from web3_flight_rpc_server_spark.operators.incremental import (
        compact_index,
    )

    old, new = _split(spark, sf_dir)
    path = str(tmp_path / "idx_bt_c")
    table = "test_idx_bands_compact"
    try:
        write_minhash_index(old, path, bands_table=table, buckets=8)
        for lo in (25, 30, 35):
            write_minhash_index(
                new.where(F.col("doc_id").between(lo, lo + 4)), path,
                append=True,
            )
        probe_docs = new.where(F.col("doc_id") >= 40)
        before_pairs = {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in dedup_against_index(
                probe_docs, path, threshold=0.3).collect()
        }
        rows_before = {
            tuple(r) for r in spark.table(table).collect()
        }
        res = compact_index(spark, path)
        assert "bands" in res
        n_after = len(spark.table(table).inputFiles())
        assert n_after <= 8 and n_after <= res["bands"][0]
        assert {tuple(r) for r in spark.table(table).collect()} \
            == rows_before
        probe = dedup_against_index(probe_docs, path, threshold=0.3)
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = dedup_against_index(
                probe_docs, path, threshold=0.3
            )._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            assert "Bucketed: true" in plan
            assert plan.count("hashpartitioning(band") == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in probe.collect()
        } == before_pairs
        # crash window: live dropped, tmp present -> next open
        # completes the rename and the probe sees the full index
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__fswap_tmp")
        assert {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in dedup_against_index(
                probe_docs, path, threshold=0.3).collect()
        } == before_pairs
        assert spark.catalog.tableExists(table)
        assert not spark.catalog.tableExists(f"{table}__fswap_tmp")
        # crash window: torn tmp CTAS (non-empty dir, no catalog
        # entry) -> swept by the next compaction, not wedged
        wh = spark.conf.get("spark.sql.warehouse.dir")
        base = urlparse(wh).path or wh
        torn = os.path.join(base, f"{table}__fswap_tmp")
        os.makedirs(os.path.join(torn, "_temporary"), exist_ok=True)
        with open(os.path.join(torn, "part-torn.parquet"), "w") as f:
            f.write("junk")
        res2 = compact_index(spark, path)
        assert "bands" in res2 and not os.path.exists(torn)
        assert {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in dedup_against_index(
                probe_docs, path, threshold=0.3).collect()
        } == before_pairs
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")


def test_compact_index_preserves_probes_and_shrinks_files(
    spark, sf_dir, tmp_path
):
    """Compaction is layout hygiene only: after several small appends
    (the streaming small-files shape), folding the datasets into few
    large files must leave probe results bit-identical and the
    manifest/layout guard intact."""
    from web3_flight_rpc_server_spark.operators.incremental import (
        compact_index,
    )

    docs = tables.load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "idx")
    write_minhash_index(docs.where(F.col("doc_id") < 10), path)
    for lo, hi in [(10, 20), (20, 30), (30, 40)]:
        write_minhash_index(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            path,
            append=True,
        )
    probe = docs.where(F.col("doc_id") >= 40)

    def snapshot():
        return {
            (r.new_id, r.idx_id, round(r.jaccard, 6))
            for r in dedup_against_index(probe, path, threshold=0.3).collect()
        }

    before = snapshot()
    stats = compact_index(spark, path)
    assert set(stats) == {"bands", "shingles"}
    for sub, (n_before, n_after) in stats.items():
        assert n_after < n_before, f"{sub}: {n_before} -> {n_after}"
        assert n_after == 1  # tiny fixture -> single file per dataset
    assert snapshot() == before
    # layout guard survives compaction (manifest untouched)
    with pytest.raises(ValueError, match="rebanding"):
        write_minhash_index(probe, path, num_hashes=64, append=True)


def test_read_recovering_missing_race_requires_success(spark, tmp_path,
                                                       monkeypatch):
    """The 'missing'-race fallback (recovery saw nothing at any name
    but live reappeared) re-reads live ONLY when it carries _SUCCESS,
    like every other fswap path — a plain mode('overwrite') mid-write
    (dir exists, marker not yet committed) must keep raising instead
    of returning partial data (r7 ADVICE). Simulates the interleaving
    by having the patched recovery materialize live and answer
    'missing'."""
    import os
    import shutil

    from pyspark.errors.exceptions.captured import AnalysisException

    from web3_flight_rpc_server_spark.operators import fswap
    from web3_flight_rpc_server_spark.operators.incremental import (
        _read_recovering,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1).write.parquet(src)

    def _materialize(live, with_success):
        def fake_recover(_spark, _live):
            shutil.copytree(src, live)
            if not with_success:
                os.remove(os.path.join(live, "_SUCCESS"))
            return "missing"
        return fake_recover

    live_ok = str(tmp_path / "live_ok")
    monkeypatch.setattr(fswap, "recover_directory",
                        _materialize(live_ok, with_success=True))
    assert [tuple(r) for r in _read_recovering(spark, live_ok).collect()
            ] == [(1, "a")]

    live_partial = str(tmp_path / "live_partial")
    monkeypatch.setattr(fswap, "recover_directory",
                        _materialize(live_partial, with_success=False))
    with pytest.raises(AnalysisException):
        _read_recovering(spark, live_partial)


def test_streaming_ingest_auto_compaction(spark, tmp_path):
    """compact_every=N folds the per-batch appended small files inside
    the foreachBatch cycle (micro-batches are serial, so compaction
    never races an append by construction — the same opt-in shape the
    semantic twin gained in r9): after several batches the bands/ and
    shingles/ data-file counts are bounded by the compaction instead
    of growing per batch, and later batches still dedup against
    survivors admitted BEFORE the compactions."""
    import os

    from web3_flight_rpc_server_spark.operators.incremental import (
        streaming_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "idx")
    kept_batches = []

    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight ok"),
        (2, "a completely different sentence with other words here now"),
    ]
    spark.createDataFrame(texts, "doc_id long, text string") \
        .write.parquet(str(src / "b1"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = streaming_ingest(
        stream, path, str(tmp_path / "ckpt"), compact_every=1,
        on_kept=lambda df, bid: kept_batches.append(
            {r.doc_id for r in df.collect()}
        ),
    )

    def n_files(sub):
        n = 0
        for root, _dirs, files in os.walk(os.path.join(path, sub)):
            if ".compacting" in root:
                continue
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    fresh = [
        (10, "entirely novel third document with fresh vocabulary words"),
        (11, "yet another unique piece of text nothing shares shingles"),
        (12, "final standalone entry covering some new topic area today"),
    ]
    try:
        q.processAllAvailable()
        for i, row in enumerate(fresh):
            spark.createDataFrame([row], "doc_id long, text string") \
                .write.mode("append").parquet(str(src / f"f{i}"))
            q.processAllAvailable()
        compacted_bands, compacted_shingles = n_files("bands"), n_files(
            "shingles"
        )
        # a dup of batch 1's survivor must still be rejected AFTER the
        # compactions (the folded index is the same row set)
        spark.createDataFrame(
            [(500, texts[0][1])], "doc_id long, text string"
        ).write.mode("append").parquet(str(src / "dup"))
        q.processAllAvailable()
    finally:
        q.stop()

    assert set().union(*kept_batches) == {1, 2, 10, 11, 12}
    # each compaction folds the whole dataset to ~1 file; without the
    # in-loop compaction this grows by >= 1 file per dataset per batch
    assert compacted_bands <= 2, compacted_bands
    assert compacted_shingles <= 2, compacted_shingles
    shingles = spark.read.parquet(path + "/shingles")
    assert shingles.select("doc_id").distinct().count() == 5
