"""Persistent fingerprint index (operators/fp_index.py): incremental
near-dup checking against an indexed corpus, generic over 64-bit
fingerprints — the fingerprint twin of tests/test_incremental.py's
contracts: probe == one-shot pairs, manifest-pinned layout refusal,
idempotent crash-replay appends, hot-bucket quarantine with exact
stats, compaction invisibility, probe-side-only shuffle on the
bucketed tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.dedup import fingerprint_pairs
from web3_flight_rpc_server_spark.operators.fp_index import (
    compact_fp_index,
    dedup_fingerprints_against_index,
    fp_index_bucket_populations,
    fp_index_hot_buckets,
    ingest_fingerprints,
    rebuild_fp_bucket_stats,
    verify_fp_bucket_stats,
    write_fingerprint_index,
)

RADIUS = 6


def _fps(spark, rows):
    return spark.createDataFrame(rows, "media_id long, phash long")


# fingerprints engineered in Hamming space: base values far apart,
# mutations = base with k low bits flipped (hamming k)
B1 = 0x0123456789ABCDEF
B2 = 0x7EDCBA9876543210  # hamming 63 from B1
B3 = 0x00FF00FF00FF00FF  # hamming 24/39 from B1/B2


def _flip(v: int, k: int) -> int:
    out = v
    for i in range(k):
        out ^= 1 << (i * 7)  # spread the flips across chunks
    return ((out + 2 ** 63) % 2 ** 64) - 2 ** 63


def test_probe_equals_one_shot_pairs(spark, tmp_path):
    """Index half the corpus, probe the other half: the (new, idx)
    pairs must equal exactly the cross-half subset of the one-shot
    fingerprint_pairs over the union."""
    idx_rows = [(1, B1), (2, B2), (3, B3)]
    new_rows = [(10, _flip(B1, 3)), (11, _flip(B2, RADIUS)),
                (12, _flip(B3, RADIUS + 1)), (13, 0x55AA55AA55AA55AA)]
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, idx_rows), path,
                            max_hamming=RADIUS)
    got = {(r.new_id, r.idx_id, r.hamming)
           for r in dedup_fingerprints_against_index(
               _fps(spark, new_rows), path).collect()}
    both = fingerprint_pairs(
        _fps(spark, idx_rows + new_rows), RADIUS,
        id_col="media_id", fp_col="phash", max_bucket=None,
    )
    want = {(r.d2, r.d1, r.hamming) for r in both.collect()
            if r.d1 <= 3 and r.d2 >= 10}
    assert got == want
    assert (10, 1, 3) in got and (11, 2, RADIUS) in got
    assert all(n != 12 for n, _, _ in got)  # outside the radius


def test_layout_pinned_and_refusals(spark, tmp_path):
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path, max_hamming=3)
    with pytest.raises(ValueError, match="radius 3"):
        write_fingerprint_index(_fps(spark, [(2, B2)]), path,
                                max_hamming=6, append=True)
    with pytest.raises(FileNotFoundError, match="no fingerprint index"):
        dedup_fingerprints_against_index(
            _fps(spark, [(9, B1)]), str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="without a hot-bucket cap"):
        fp_index_hot_buckets(spark, path)


def test_append_idempotent_across_replay(spark, tmp_path):
    """Re-appending the same batch (a crash-replay) must not duplicate
    chunk rows or inflate bucket stats."""
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                            max_hamming=RADIUS, max_bucket=10)
    batch = _fps(spark, [(2, B2), (3, B3)])
    write_fingerprint_index(batch, path, append=True)
    write_fingerprint_index(batch, path, append=True)  # replay
    chunks = spark.read.parquet(f"{path}/chunks")
    assert chunks.count() == 3 * (RADIUS + 1)
    assert chunks.select("id").distinct().count() == 3
    pops = {(r.chunk_idx, r.chunk): r.n
            for r in fp_index_bucket_populations(spark, path).collect()}
    assert all(n <= 3 for n in pops.values())
    assert verify_fp_bucket_stats(spark, path)


def test_hot_bucket_quarantine_and_repair(spark, tmp_path):
    """A template pile in the index is excluded from probes under the
    manifest cap; a stats rebuild recounts exactly."""
    path = str(tmp_path / "fpidx")
    pile = [(i, B1) for i in range(20)]  # 20 identical fingerprints
    write_fingerprint_index(
        _fps(spark, pile + [(100, B2)]), path,
        max_hamming=RADIUS, max_bucket=10,
    )
    hot = fp_index_hot_buckets(spark, path).collect()
    assert hot and all(r.n == 20 for r in hot)
    probe = _fps(spark, [(200, _flip(B1, 2)), (201, _flip(B2, 2))])
    got = {(r.new_id, r.idx_id)
           for r in dedup_fingerprints_against_index(probe, path).collect()}
    # every chunk of the pile is over-cap -> probe 200 finds nothing;
    # the healthy item still matches
    assert got == {(201, 100)}
    # repair: wipe stats, rebuild from chunks, verify agreement
    rebuild_fp_bucket_stats(spark, path)
    assert verify_fp_bucket_stats(spark, path)
    assert {(r.chunk_idx, r.chunk) for r in
            fp_index_hot_buckets(spark, path).collect()} == \
        {(r.chunk_idx, r.chunk) for r in hot}


def test_ingest_loop_admits_and_indexes(spark, tmp_path):
    """Two ingest cycles: batch-internal dups resolve to the min id,
    index hits reject, survivors are probe-visible to the next batch."""
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                            max_hamming=RADIUS)
    admitted, dups = ingest_fingerprints(
        _fps(spark, [(10, _flip(B1, 2)),      # dup of indexed 1
                     (11, B2), (12, _flip(B2, 1)),  # internal pair
                     (13, B3)]), path)
    assert {r.media_id for r in admitted.collect()} == {11, 13}
    got = {(r.new_id, r.idx_id) for r in dups.collect()}
    assert got == {(10, 1), (12, 11)}
    # next batch sees this batch's survivors
    admitted2, dups2 = ingest_fingerprints(
        _fps(spark, [(20, _flip(B3, 1))]), path)
    assert admitted2.isEmpty()
    assert {(r.new_id, r.idx_id) for r in dups2.collect()} == {(20, 13)}


def test_compaction_is_invisible_to_probes(spark, tmp_path):
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                            max_hamming=RADIUS, max_bucket=10)
    for j in range(4):
        write_fingerprint_index(
            _fps(spark, [(10 + j, _flip(B2, j))]), path, append=True)
    probe = _fps(spark, [(200, _flip(B1, 1)), (201, B2)])
    before = {(r.new_id, r.idx_id, r.hamming)
              for r in dedup_fingerprints_against_index(
                  probe, path).collect()}
    stats = compact_fp_index(spark, path)
    assert stats["chunks"][1] <= stats["chunks"][0]
    spark.catalog.refreshByPath(f"{path}/chunks")
    spark.catalog.refreshByPath(f"{path}/bucket_stats")
    after = {(r.new_id, r.idx_id, r.hamming)
             for r in dedup_fingerprints_against_index(
                 probe, path).collect()}
    assert after == before and before
    assert verify_fp_bucket_stats(spark, path)


def test_probe_plan_no_cartesian(spark, tmp_path):
    path = str(tmp_path / "fpidx")
    write_fingerprint_index(_fps(spark, [(1, B1), (2, B2)]), path,
                            max_hamming=RADIUS, max_bucket=10)
    df = dedup_fingerprints_against_index(
        _fps(spark, [(10, _flip(B1, 1))]), path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_ingest_bootstrap_and_dedup(spark, tmp_path):
    """Stream twin: bootstraps an empty index, admits non-dups across
    micro-batches, rejects a later batch's near-dup of an earlier
    batch's survivor, and hands survivors to on_admitted."""
    from web3_flight_rpc_server_spark.operators.fp_index import (
        streaming_ingest_fingerprints,
    )

    path = str(tmp_path / "fpidx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _fps(spark, [(1, B1), (2, _flip(B1, 1)), (3, B2)]) \
        .write.parquet(src)
    seen: list[tuple[int, set]] = []

    def on_admitted(df, batch_id):
        seen.append((batch_id, {r.media_id for r in df.collect()}))

    stream = spark.readStream.schema(
        "media_id long, phash long"
    ).parquet(src)
    q = streaming_ingest_fingerprints(
        stream, path, ckpt, max_hamming=RADIUS, on_admitted=on_admitted,
        max_bucket=100,
    )
    try:
        q.processAllAvailable()
        # second file: a dup of survivor 1 and a fresh item
        _fps(spark, [(10, _flip(B1, 2)), (11, B3)]) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    admitted_all = set().union(*(s for _, s in seen))
    # batch 1: 1 and 2 are an internal pair (min id 1 wins) + 3
    # batch 2: 10 collides with indexed 1; 11 is fresh
    assert admitted_all == {1, 3, 11}
    idx_ids = {r.id for r in
               spark.read.parquet(f"{path}/chunks").select("id")
               .distinct().collect()}
    assert idx_ids == {1, 3, 11}
    assert verify_fp_bucket_stats(spark, path)


def test_bucketed_chunks_tier_no_exchange_on_index_side(spark, tmp_path):
    """The metastore bucketed-chunks tier: the probe join must shuffle
    ONLY the probe side — the chunks table's pinned (chunk_idx, chunk)
    hash partitioning satisfies the join's distribution requirement —
    with identical pairs to the plain tier, and appends following the
    manifest's tier into the table."""
    rng_rows = [(i, B1 ^ (i * 0x9E3779B97F4A7C15 % 2 ** 63)) for i in
                range(40)]
    idx_rows = rng_rows + [(100, B1), (101, B2)]
    probe_rows = [(200, _flip(B1, 2)), (201, _flip(B2, 3)),
                  (202, 0x55AA55AA55AA55AA)]
    plain_path = str(tmp_path / "idx_plain")
    bt_path = str(tmp_path / "idx_bucketed")
    table = "test_fp_chunks"
    write_fingerprint_index(_fps(spark, idx_rows), plain_path,
                            max_hamming=RADIUS)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_fingerprint_index(_fps(spark, idx_rows), bt_path,
                                max_hamming=RADIUS, chunks_table=table,
                                buckets=8)
        probe = dedup_fingerprints_against_index(
            _fps(spark, probe_rows), bt_path)
        fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = probe._jdf.queryExecution().explainString(fmt)
        assert "Bucketed: true" in plan, "index side not read as bucketed"
        assert plan.count("hashpartitioning(chunk_idx") == 1, plan
        plain_probe = dedup_fingerprints_against_index(
            _fps(spark, probe_rows), plain_path)
        plain_plan = plain_probe._jdf.queryExecution().explainString(fmt)
        assert plain_plan.count("hashpartitioning(chunk_idx") == 2
        got = {(r.new_id, r.idx_id, r.hamming) for r in probe.collect()}
        want = {(r.new_id, r.idx_id, r.hamming)
                for r in plain_probe.collect()}
        assert got == want
        assert (200, 100, 2) in got and (201, 101, 3) in got
        # append follows the manifest's tier into the table
        before = spark.table(table).count()
        write_fingerprint_index(_fps(spark, [(300, B3)]), bt_path,
                                append=True)
        assert spark.table(table).count() == before + RADIUS + 1
        hits = dedup_fingerprints_against_index(
            _fps(spark, [(400, B3)]), bt_path).collect()
        assert any(r.idx_id == 300 and r.hamming == 0 for r in hits)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_chunks_compaction_and_crash_windows(spark, tmp_path):
    """In-loop metastore-swap compaction for the chunks_table tier
    (r13 VERDICT #1, the gap compact_fp_index used to skip): probes
    bit-identical across the fold, bucket layout preserved, file count
    folded to <= buckets, bucket stats still verify (the fold is pure
    layout hygiene, no distinct), and both crash windows self-heal —
    live dropped with tmp present, and a torn tmp CTAS directory
    swept rather than wedging the next pass (r13 ADVICE)."""
    import os
    from urllib.parse import urlparse

    path = str(tmp_path / "fpidx_bt_c")
    table = "test_fp_chunks_compact"
    try:
        write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                                max_hamming=RADIUS, chunks_table=table,
                                buckets=4, max_bucket=100)
        for i in range(4):
            write_fingerprint_index(
                _fps(spark, [(10 + i, _flip(B2, 8 * (i + 1)))]), path,
                append=True,
            )
        probe = _fps(spark, [(200, _flip(B1, 2)), (201, _flip(B2, 3))])
        before_pairs = {
            (r.new_id, r.idx_id, r.hamming)
            for r in dedup_fingerprints_against_index(
                probe, path).collect()
        }
        rows_before = {tuple(r) for r in spark.table(table).collect()}
        res = compact_fp_index(spark, path)
        assert "chunks" in res
        n_after = len(spark.table(table).inputFiles())
        assert n_after <= 4 and n_after <= res["chunks"][0]
        assert {tuple(r) for r in spark.table(table).collect()} \
            == rows_before
        assert verify_fp_bucket_stats(spark, path)
        assert {
            (r.new_id, r.idx_id, r.hamming)
            for r in dedup_fingerprints_against_index(
                probe, path).collect()
        } == before_pairs
        # crash window: live dropped, tmp present -> rename completed
        # at the next open
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__fswap_tmp")
        assert {
            (r.new_id, r.idx_id, r.hamming)
            for r in dedup_fingerprints_against_index(
                probe, path).collect()
        } == before_pairs
        assert spark.catalog.tableExists(table)
        assert not spark.catalog.tableExists(f"{table}__fswap_tmp")
        # crash window: torn tmp CTAS swept, compaction not wedged
        wh = spark.conf.get("spark.sql.warehouse.dir")
        base = urlparse(wh).path or wh
        torn = os.path.join(base, f"{table}__fswap_tmp")
        os.makedirs(os.path.join(torn, "_temporary"), exist_ok=True)
        with open(os.path.join(torn, "part-torn.parquet"), "w") as f:
            f.write("junk")
        res2 = compact_fp_index(spark, path)
        assert "chunks" in res2 and not os.path.exists(torn)
        assert {
            (r.new_id, r.idx_id, r.hamming)
            for r in dedup_fingerprints_against_index(
                probe, path).collect()
        } == before_pairs
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")


def test_probe_one_row_per_pair_min_hamming(spark, tmp_path):
    """An id appearing with SEVERAL distinct fingerprints (duplicate
    probe ids, or a caller that violated id uniqueness across appends)
    must still yield exactly ONE (new_id, idx_id) row, carrying the
    MIN hamming — the r7 ADVICE contract fix; the old distinct was
    keyed on the fingerprint pair and leaked one row per variant."""
    path = str(tmp_path / "fpidx_dupid")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                            max_hamming=RADIUS)
    # id 10 twice: hamming 4 and hamming 1 variants of B1
    probe = _fps(spark, [(10, _flip(B1, 4)), (10, _flip(B1, 1)),
                         (11, _flip(B1, 2))])
    rows = dedup_fingerprints_against_index(probe, path).collect()
    assert sorted((r.new_id, r.idx_id, r.hamming) for r in rows) == [
        (10, 1, 1), (11, 1, 2)
    ]
    # and the index side too: same idx id under two fingerprints
    path2 = str(tmp_path / "fpidx_dupidx")
    write_fingerprint_index(
        _fps(spark, [(1, B1), (1, _flip(B1, 3))]), path2,
        max_hamming=RADIUS)
    rows2 = dedup_fingerprints_against_index(
        _fps(spark, [(20, B1)]), path2).collect()
    assert [(r.new_id, r.idx_id, r.hamming) for r in rows2] == [(20, 1, 0)]


def test_bucket_stats_apis_refuse_uncapped_index(spark, tmp_path):
    """All three bucket-stats entry points on an index built WITHOUT a
    cap raise the same descriptive ValueError instead of a raw
    AnalysisException out of the missing bucket_stats/ read (r7
    ADVICE)."""
    path = str(tmp_path / "fpidx_uncapped")
    write_fingerprint_index(_fps(spark, [(1, B1)]), path,
                            max_hamming=RADIUS, max_bucket=None)
    for fn in (fp_index_bucket_populations, fp_index_hot_buckets,
               verify_fp_bucket_stats, rebuild_fp_bucket_stats):
        with pytest.raises(ValueError, match="without a hot-bucket cap"):
            fn(spark, path)


def test_streaming_ingest_fp_auto_compaction(spark, tmp_path):
    """compact_every=N inside the fingerprint stream's foreachBatch:
    chunks/ file count stays bounded by the compaction instead of
    growing per batch, bucket_stats populations survive the SUM fold
    (verify_fp_bucket_stats), and a near-dup of a pre-compaction
    survivor is still rejected afterwards."""
    import os

    from web3_flight_rpc_server_spark.operators.fp_index import (
        streaming_ingest_fingerprints,
    )

    path = str(tmp_path / "fpidx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _fps(spark, [(1, B1), (2, B2)]).write.parquet(src)
    seen: list[set] = []

    stream = spark.readStream.schema(
        "media_id long, phash long"
    ).parquet(src)
    q = streaming_ingest_fingerprints(
        stream, path, ckpt, max_hamming=RADIUS, max_bucket=100,
        compact_every=1,
        on_admitted=lambda df, bid: seen.append(
            {r.media_id for r in df.collect()}
        ),
    )

    def n_chunk_files():
        n = 0
        for root, _dirs, files in os.walk(os.path.join(path, "chunks")):
            if ".compacting" in root:
                continue
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    try:
        q.processAllAvailable()
        for i in range(3):  # three fresh fingerprints, one per batch
            fp = (B3 * (i + 3)) ^ (0x0F0F0F0F0F0F0F0F << i) & 0x7FFFFFFFFFFFFFFF
            _fps(spark, [(100 + i, fp)]).write.mode("append").parquet(src)
            q.processAllAvailable()
        compacted = n_chunk_files()
        # near-dup of batch 1's survivor: still rejected post-compaction
        _fps(spark, [(500, _flip(B1, 1))]).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    admitted_all = set().union(*seen)
    assert 500 not in admitted_all
    assert {1, 2, 100, 101, 102} <= admitted_all
    assert compacted <= 2, compacted
    assert verify_fp_bucket_stats(spark, path)


def test_on_admitted_at_least_once_across_crash(spark, tmp_path):
    """r13 VERDICT #3: a crash after the index append but before the
    downstream commit replays the batch; previously-admitted ids
    self-match the index (new_id == idx_id at Hamming 0) and must be
    re-handed to on_admitted, so an idempotent downstream sink
    converges instead of losing the batch."""
    import os

    from web3_flight_rpc_server_spark.operators.fp_index import (
        streaming_ingest_fingerprints,
    )

    src = str(tmp_path / "src_alo")
    path = str(tmp_path / "fpidx_alo")
    ck = str(tmp_path / "ck_alo")
    sink: set = set()

    def on_admitted(df, batch_id):
        sink.update(r.media_id for r in df.collect())

    def start():
        return streaming_ingest_fingerprints(
            spark.readStream.schema("media_id long, phash long")
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            path, ck, max_hamming=RADIUS, on_admitted=on_admitted,
        )

    os.makedirs(src)
    _fps(spark, [(1, B1)]).coalesce(1).write.parquet(src + "/b0")
    q = start()
    try:
        q.processAllAvailable()
        _fps(spark, [(2, B2), (3, B3)]).coalesce(1).write.parquet(
            src + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 2, 3}
    commits = os.path.join(ck, "commits")
    newest = max(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(newest)))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    sink -= {2, 3}  # downstream lost batch 1's delivery
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 2, 3}, "replayed ids were not re-delivered"
    chunks = spark.read.parquet(path + "/chunks")
    assert chunks.groupBy("id", "chunk_idx").count() \
        .where("count > 1").count() == 0
