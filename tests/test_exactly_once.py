"""Exactly-once epoch-manifest sink (streaming/exactly_once.py).

The property under test is idempotence under the two failure shapes
foreachBatch actually produces: a REPLAY of a committed epoch (crash
after marker, before checkpoint commit) and a RETRY of a torn epoch
(crash mid-write, no marker). The end-to-end case forces a genuine
engine replay by restoring a stale checkpoint — the filesystem
equivalent of dying between the sink and the offset commit."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.streaming.exactly_once import (
    ExactlyOnceParquetSink,
    read_committed,
)

SCHEMA = "event_id long, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_replayed_epoch_is_dropped_whole(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    sink(_df(spark, [(1, "a"), (2, "b")]), 0)
    sink(_df(spark, [(3, "c")]), 1)
    # engine replay of epoch 1 — even with different-looking content,
    # the committed marker wins and nothing changes
    sink(_df(spark, [(3, "c"), (99, "GARBAGE")]), 1)
    got = {
        (r.event_id, r.v, r.epoch) for r in read_committed(spark, out).collect()
    }
    assert got == {(1, "a", 0), (2, "b", 0), (3, "c", 1)}
    assert sink.committed_epochs(spark) == [0, 1]


def test_torn_epoch_is_invisible_then_retried_clean(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    sink(_df(spark, [(1, "a")]), 0)
    # simulate a crash mid-write: epoch dir exists with garbage bytes,
    # no marker
    torn = tmp_path / "sink" / "data" / "epoch=1"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"not parquet")
    got = {(r.event_id, r.epoch) for r in read_committed(spark, out).collect()}
    assert got == {(1, 0)}, "torn epoch leaked into the committed view"
    # the retry overwrites the torn dir and commits
    sink(_df(spark, [(2, "b")]), 1)
    got = {(r.event_id, r.epoch) for r in read_committed(spark, out).collect()}
    assert got == {(1, 0), (2, 1)}


def test_transform_runs_inside_the_epoch(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(
        out, transform=lambda df: df.where(F.col("event_id") % 2 == 0)
    )
    sink(_df(spark, [(1, "a"), (2, "b"), (4, "c")]), 0)
    got = {r.event_id for r in read_committed(spark, out).collect()}
    assert got == {2, 4}


def test_no_committed_epochs_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed epochs"):
        read_committed(spark, str(tmp_path / "nothing"))


def test_engine_replay_after_checkpoint_restore(spark, tmp_path):
    """Force a real engine replay: run a file-source stream through the
    sink, snapshot the checkpoint, process one more file, then restore
    the stale checkpoint and restart — the engine re-offers the last
    epoch and the sink must drop it."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ckpt_bak = str(tmp_path / "ckpt_bak")
    os.makedirs(src)
    sink = ExactlyOnceParquetSink(out)

    def start():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _df(spark, [(1, "a")]).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    shutil.copytree(ckpt, ckpt_bak)  # crash snapshot: epoch 0 committed
    _df(spark, [(2, "b")]).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    # "crash": lose the checkpoint progress for the last epoch, keeping
    # the sink's state — on restart the engine replays that epoch
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_bak, ckpt)
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.event_id, r.epoch) for r in read_committed(spark, out).collect()
    )
    assert rows == [(1, 0), (2, 1)], f"replayed epoch duplicated: {rows}"


def _rows(spark, out):
    return {(r.event_id, r.v, r.epoch)
            for r in read_committed(spark, out).collect()}


def _epoch_dirs(out):
    data = os.path.join(out, "data")
    return sorted(
        d for d in os.listdir(data) if d.startswith("epoch=")
    ) if os.path.isdir(data) else []


def test_compaction_is_read_invisible_and_bounds_files(spark, tmp_path):
    """compact_committed_epochs: read_committed output row-identical
    (original epoch values preserved), per-epoch dirs folded into one
    segment, epoch markers NEVER deleted — so an engine replay of a
    long-compacted epoch is still dropped whole."""
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        compact_committed_epochs,
    )

    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    for b in range(6):
        sink(_df(spark, [(10 * b + i, f"v{b}") for i in range(3)]), b)
    before = _rows(spark, out)
    assert len(_epoch_dirs(out)) == 6
    res = compact_committed_epochs(spark, out, target_files=2)
    assert res == {"folded": 6, "upto": 5}
    assert _rows(spark, out) == before
    assert _epoch_dirs(out) == []
    seg = os.path.join(out, "compact", "upto=5")
    files = [f for f in os.listdir(seg) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 2
    # markers survive: replaying a folded epoch changes nothing
    assert sink.committed_epochs(spark) == list(range(6))
    sink(_df(spark, [(999, "GARBAGE")]), 2)
    assert _rows(spark, out) == before
    # incremental: new epochs land per-epoch, a second pass folds them
    # INTO the segment (previous segment + markers swapped)
    sink(_df(spark, [(100, "v6")]), 6)
    sink(_df(spark, [(101, "v7")]), 7)
    mid = _rows(spark, out)
    assert mid == before | {(100, "v6", 6), (101, "v7", 7)}
    res2 = compact_committed_epochs(spark, out, target_files=2)
    assert res2 == {"folded": 2, "upto": 7}
    assert _rows(spark, out) == mid
    assert _epoch_dirs(out) == []
    assert not os.path.exists(os.path.join(out, "compact", "upto=5"))
    # only the latest high-water marker survives (hadoop-local .crc
    # sidecars are metadata, not markers)
    assert [m for m in os.listdir(os.path.join(out, "_compact"))
            if not m.startswith(".")] == ["7"]


def test_compaction_keep_last_and_noop(spark, tmp_path):
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        compact_committed_epochs,
    )

    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    for b in range(4):
        sink(_df(spark, [(b, f"v{b}")]), b)
    before = _rows(spark, out)
    res = compact_committed_epochs(spark, out, keep_last=2)
    assert res == {"folded": 2, "upto": 1}
    assert _rows(spark, out) == before
    assert _epoch_dirs(out) == ["epoch=2", "epoch=3"]
    # single fresh epoch with keep_last=0 on an uncompacted dir: a
    # 1-epoch fold is a pointless rewrite -> no-op (but with an
    # existing segment it folds, keeping the invariant one-segment)
    out2 = str(tmp_path / "sink2")
    sink2 = ExactlyOnceParquetSink(out2)
    sink2(_df(spark, [(1, "a")]), 0)
    assert compact_committed_epochs(spark, out2) == {
        "folded": 0, "upto": None
    }


def test_compaction_crash_windows_converge(spark, tmp_path):
    """The two crash windows: (a) segment written, marker missing —
    stale segment never read, next pass rewrites it; (b) marker
    committed, folded epoch dirs not yet deleted — readers ignore
    epochs <= marker, next pass deletes them."""
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        compact_committed_epochs,
    )

    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    for b in range(3):
        sink(_df(spark, [(b, f"v{b}")]), b)
    truth = _rows(spark, out)
    # (a) stale segment without marker
    stale = os.path.join(out, "compact", "upto=2")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-0.parquet"), "wb") as f:
        f.write(b"torn")
    assert _rows(spark, out) == truth
    assert compact_committed_epochs(spark, out) == {
        "folded": 3, "upto": 2
    }
    assert _rows(spark, out) == truth
    # (b) marker committed but a folded epoch dir resurrects (crash
    # before delete): invisible to readers, swept by the next pass
    ghost = os.path.join(out, "data", "epoch=1")
    os.makedirs(ghost)
    _df(spark, [(777, "GHOST")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(ghost)
    assert _rows(spark, out) == truth
    sink(_df(spark, [(50, "v3")]), 3)
    compact_committed_epochs(spark, out)
    assert _rows(spark, out) == truth | {(50, "v3", 3)}
    assert _epoch_dirs(out) == []


def test_stranded_compaction_markers_reclaimed(spark, tmp_path):
    """A crash between a pass's marker commit and its cleanup strands
    the OLDER marker; deleting only the tracked prev at the end of a
    pass would leave stale marks behind forever (harmless for reads —
    _compacted_upto takes max — but never reclaimed, r13 ADVICE). The
    recovery sweep now deletes every marker below the current max."""
    from web3_flight_rpc_server_spark.streaming.exactly_once import (
        compact_committed_epochs,
    )

    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    for b in range(3):
        sink(_df(spark, [(b, f"v{b}")]), b)
    truth = _rows(spark, out)
    compact_committed_epochs(spark, out)  # marker 2 commits
    # fabricate the stranded marks a crashed cleanup leaves behind
    mdir = os.path.join(out, "_compact")
    for stale in ("0", "1"):
        open(os.path.join(mdir, stale), "w").close()
    assert _rows(spark, out) == truth  # reads take max: unaffected
    sink(_df(spark, [(50, "v3")]), 3)
    compact_committed_epochs(spark, out)
    assert [m for m in os.listdir(mdir)
            if not m.startswith(".")] == ["3"]
    assert _rows(spark, out) == truth | {(50, "v3", 3)}


def test_gated_ingest_exactly_once_bounded_files(spark, tmp_path):
    """The gated-ingest endpoint drill (r12 VERDICT #6): survivors of
    the stateless gates land through the epoch-manifest sink with
    in-loop compaction — the committed view equals the batch-oracle
    survivor set, no duplicate ids, and the file count stays bounded
    instead of growing one per batch."""
    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
    )
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        gate_stream,
        gated_ingest_exactly_once,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "gated")
    os.makedirs(src)
    n_batches, rows = 12, 6

    def _doc(i):
        # odd ids carry a blocklisted token -> gated out; synthetic
        # tokens hit no stopwords -> lang "unknown"
        body = " ".join(f"alpha{j} beta{j}" for j in range(6))
        bad = " badword" if i % 2 else ""
        return (i, f"doc {i} {body}{bad}", "x")

    cfg = CurationConfig(allowed_langs=("unknown",), min_quality=0.0,
                         blocklist=("badword",))
    schema = "doc_id long, text string, lang string"
    for b in range(n_batches):
        spark.createDataFrame(
            [_doc(b * rows + r) for r in range(rows)], schema
        ).coalesce(1).write.parquet(f"{src}/b{b:03d}")
    q = gated_ingest_exactly_once(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
        out, str(tmp_path / "ck"), cfg=cfg, compact_every=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    planted = spark.createDataFrame(
        [_doc(i) for i in range(n_batches * rows)], schema
    )
    want = {r.doc_id for r in
            gate_stream(planted, cfg).select("doc_id").collect()}
    # non-vacuity: the gate admits exactly the even ids
    assert want == {i for i in range(n_batches * rows) if i % 2 == 0}
    got_df = read_committed(spark, out)
    got = [r.doc_id for r in got_df.select("doc_id").collect()]
    assert set(got) == want and len(got) == len(want)
    # bounded: after the last in-loop pass at batch 11, at most the
    # consolidated segment + epochs since that pass remain
    assert len(_epoch_dirs(out)) <= 4
    total_files = sum(
        len(files) for _, _, files in os.walk(os.path.join(out))
        for f in [files] if True
    )
    n_parquet = sum(
        f.endswith(".parquet") for _, _, files in os.walk(out)
        for f in files
    )
    assert n_parquet <= 4 + 4  # segment (<=4 files) + <=4 live epochs
