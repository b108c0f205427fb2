"""Persistent span index (operators/span_index.py): cross-batch Lee
et al. span removal with content-based replay self-healing. Streaming
state is not DuckDB-expressible, so this tier is pytest-gated like
the other index twins (SURVEY §5 convention)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.span_index import (
    compact_span_index,
    ingest_spans_batch,
    init_span_index,
    read_span_manifest,
    streaming_ingest_spans,
)

K = 4


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _init(spark, tmp_path, k=K):
    root = str(tmp_path / "spanidx")
    init_span_index(_df(spark, []), root, k=k)
    return root


def _ingest(spark, root, rows):
    rejects, admitted = ingest_spans_batch(_df(spark, rows), root)
    return (
        {r.doc_id: r.reject_reason for r in rejects.collect()},
        {r.doc_id: r for r in admitted.collect()},
    )


def test_first_batch_matches_batch_operator(spark, tmp_path):
    """An empty index must make batch 1 behave exactly like the
    one-shot operator (same keep-first, keeper protection, rebuild)."""
    from web3_flight_rpc_server_spark.operators.substrdedup import (
        dedup_substrings,
    )

    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e f g h z"),
        (3, " ".join(["x"] * 10)),
        (4, "p q r s t u v w"),
    ]
    root = _init(spark, tmp_path)
    rej, adm = _ingest(spark, root, rows)
    want = {r.doc_id: r for r in
            dedup_substrings(_df(spark, rows), k=K).collect()}
    assert rej == {}
    for i, _t in rows:
        assert adm[i].text == want[i].text
        assert (adm[i].n_kept, adm[i].n_dropped) == (
            want[i].n_kept, want[i].n_dropped)


def test_cross_batch_span_removed_and_exact_copy_rejected(spark, tmp_path):
    root = _init(spark, tmp_path)
    _ingest(spark, root, [(1, "a b c d e f g h")])
    rej, adm = _ingest(spark, root, [
        (10, "P Q a b c d e f g h R"),   # batch-2 doc quoting batch 1
        (11, "a b c d e f g h"),          # exact copy of history
        (12, "fresh words only here now"),
    ])
    assert adm[10].text == "P Q R"
    assert adm[10].n_dropped == 8
    assert rej == {11: "all_spans_duplicated"}
    assert adm[12].text == "fresh words only here now"


def test_admitted_cleaned_text_is_the_indexed_canon(spark, tmp_path):
    """Batch 3 must dedup against what batch 2 ADMITTED (its cleaned
    text), not against what batch 2 submitted."""
    root = _init(spark, tmp_path)
    _ingest(spark, root, [(1, "a b c d e")])
    _, adm2 = _ingest(spark, root, [(2, "a b c d e F G H I J")])
    assert adm2[2].text == "F G H I J"
    rej3, adm3 = _ingest(spark, root, [(3, "F G H I J")])
    assert rej3 == {3: "all_spans_duplicated"}
    assert adm3 == {}


def test_replay_batch_rejected_by_identity(spark, tmp_path):
    root = _init(spark, tmp_path)
    rows = [(1, "a b c d e f"), (2, "g h i j k l")]
    _ingest(spark, root, rows)
    rej, adm = _ingest(spark, root, rows)
    assert rej == {1: "already_admitted", 2: "already_admitted"}
    assert adm == {}
    idx = spark.read.parquet(root + "/windows")
    assert idx.groupBy("h", "doc_id").count().where("count > 1") \
        .count() == 0


def test_crash_window_replay_converges(spark, tmp_path):
    """Simulate a crash BETWEEN the window append and the id append:
    the replayed batch must re-derive byte-identical admitted output
    (self-exclusion hides its own half-appended windows) and append
    idempotently."""
    root = _init(spark, tmp_path)
    _ingest(spark, root, [(1, "a b c d e f g h")])

    batch2 = [(20, "x y a b c d e f g h z"), (21, "m n o p q r s t")]
    rej, adm = _ingest(spark, root, batch2)
    assert adm[20].text == "x y z"
    # crash simulation: roll back the id append only (windows stay)
    admitted_dir = root + "/admitted"
    files = sorted(os.listdir(admitted_dir))
    import shutil
    import glob

    # remove the newest admitted-id files by rewriting the dir with
    # only doc_id=1 (pre-batch-2 state)
    pre = spark.createDataFrame([(1,)], "doc_id long")
    tmpd = str(tmp_path / "pre_ids")
    pre.coalesce(1).write.parquet(tmpd)
    shutil.rmtree(admitted_dir)
    shutil.copytree(tmpd, admitted_dir)

    rej2, adm2 = _ingest(spark, root, batch2)
    assert adm2[20].text == "x y z"
    assert (adm2[20].n_kept, adm2[20].n_dropped) == (
        adm[20].n_kept, adm[20].n_dropped)
    assert adm2[21].text == adm[21].text
    idx = spark.read.parquet(root + "/windows")
    assert idx.groupBy("h", "doc_id").count().where("count > 1") \
        .count() == 0
    assert files  # silence unused warning paranoia


def test_k_mismatch_refused(spark, tmp_path):
    root = _init(spark, tmp_path, k=4)
    assert read_span_manifest(spark, root) == 4
    src = str(tmp_path / "src_km")
    os.makedirs(src)
    with pytest.raises(ValueError, match="k="):
        q = streaming_ingest_spans(
            spark.readStream.schema("doc_id long, text string")
            .parquet(src),
            root, str(tmp_path / "ck"), k=7,
        )
        q.stop()


def test_compaction_is_probe_invisible(spark, tmp_path):
    root = _init(spark, tmp_path)
    for b in range(4):
        _ingest(spark, root, [
            (100 + b, f"u{b} v{b} w{b} x{b} y{b} z{b}")
        ])
    before = {(r.h, r.doc_id)
              for r in spark.read.parquet(root + "/windows").collect()}
    compact_span_index(spark, root)
    after = {(r.h, r.doc_id)
             for r in spark.read.parquet(root + "/windows").collect()}
    assert before == after
    rej, adm = _ingest(spark, root, [(200, "u0 v0 w0 x0 y0 z0")])
    assert rej == {200: "all_spans_duplicated"}


def test_hash_tier_mismatch_refused(spark, tmp_path):
    """A manifest pinning a non-xxhash64 hash tier must refuse the
    probe outright — probing a foreign hash space with xxhash64
    windows would never collide and silently admit every duplicate
    (r12 ADVICE; the same refusal class as the k mismatch)."""
    root = str(tmp_path / "spanidx_hash")
    spark.createDataFrame(
        [(K, "sha1-trunc64", None, 0)],
        "k int, hash string, windows_table string, buckets int",
    ).coalesce(1).write.parquet(root + "/manifest")
    with pytest.raises(ValueError, match="hash tier"):
        read_span_manifest(spark, root)
    with pytest.raises(ValueError, match="hash tier"):
        ingest_spans_batch(_df(spark, [(1, "a b c d e")]), root)


def test_bucketed_windows_tier_no_exchange_on_index_side(spark, tmp_path):
    """The metastore bucketed-windows tier: the probe join must
    shuffle ONLY the batch side — the windows table's pinned (h) hash
    partitioning satisfies the join's distribution requirement, so
    the plan carries no Exchange over the index scan (the
    incremental.py bands-table / fp_index.py chunks_table contract)."""
    from web3_flight_rpc_server_spark.operators.span_index import (
        _read_manifest,
        _read_windows,
        _windows,
    )

    plain_root = str(tmp_path / "spanidx_plain")
    bt_root = str(tmp_path / "spanidx_bt")
    table = "test_span_windows"
    corpus = [(i, f"w{i} x{i} a b c d e f t{i}") for i in range(20)]
    init_span_index(_df(spark, []), plain_root, k=K)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        init_span_index(_df(spark, []), bt_root, k=K,
                        windows_table=table, buckets=8)
        ingest_spans_batch(_df(spark, corpus), plain_root)
        ingest_spans_batch(_df(spark, corpus), bt_root)

        def _probe_plan(root):
            m = _read_manifest(spark, root)
            occ = _windows(_df(spark, [(100, "a b c d e f q r")]),
                           K, "doc_id", "text")
            idx = _read_windows(spark, root, m)
            hit = occ.alias("o").join(
                idx.alias("x"),
                (F.col("o.h") == F.col("x.h"))
                & (F.col("o.doc_id") != F.col("x.doc_id")),
                "left_semi",
            )
            fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                .fromString("formatted")
            return hit._jdf.queryExecution().explainString(fmt)

        plan = _probe_plan(bt_root)
        assert "Bucketed: true" in plan, "index side not read as bucketed"
        # exactly one h-exchange: the probe side's (the plain tier
        # plans two — both join children shuffle)
        assert plan.count("hashpartitioning(h#") == 1, plan
        plain_plan = _probe_plan(plain_root)
        assert plain_plan.count("hashpartitioning(h#") == 2, plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_tier_bit_identical_and_replay_converges(spark, tmp_path):
    """The bucketed tier must produce byte-identical admission
    decisions to the plain-parquet tier across a multi-batch sequence,
    follow the manifest's tier on append (bounded files: at most one
    per non-empty bucket per append), and survive the crash-window
    forced replay with the same convergence as v1."""
    import shutil

    plain_root = str(tmp_path / "sp_plain")
    bt_root = str(tmp_path / "sp_bt")
    table = "test_span_windows_bi"
    batches = [
        [(1, "a b c d e f g h"), (2, "x y a b c d e f g h z")],
        [(10, "P Q a b c d e f g h R"), (11, "a b c d e f g h"),
         (12, "fresh words only here now")],
        [(20, "P Q R S T U V W"), (12, "fresh words only here now")],
    ]
    init_span_index(_df(spark, []), plain_root, k=K)
    try:
        init_span_index(_df(spark, []), bt_root, k=K,
                        windows_table=table, buckets=4)
        files_before = 0
        for rows in batches:
            rej_p, adm_p = _ingest(spark, plain_root, rows)
            rej_b, adm_b = _ingest(spark, bt_root, rows)
            assert rej_b == rej_p
            assert {i: (r.text, r.n_kept, r.n_dropped)
                    for i, r in adm_b.items()} == \
                   {i: (r.text, r.n_kept, r.n_dropped)
                    for i, r in adm_p.items()}
            files_now = len(spark.table(table).inputFiles())
            assert files_now - files_before <= 4, \
                "append wrote more than one file per bucket"
            files_before = files_now
        # crash window: roll back the admitted-id append only; the
        # replay must re-derive identical output via self-exclusion
        batch4 = [(30, "M N a b c d e f g h O")]
        _, adm4 = _ingest(spark, bt_root, batch4)
        pre = spark.createDataFrame(
            [(i,) for i in (1, 2, 10, 12, 20)], "doc_id long")
        tmpd = str(tmp_path / "pre_ids_bt")
        pre.coalesce(1).write.parquet(tmpd)
        shutil.rmtree(bt_root + "/admitted")
        shutil.copytree(tmpd, bt_root + "/admitted")
        _, adm4r = _ingest(spark, bt_root, batch4)
        assert adm4r[30].text == adm4[30].text == "M N O"
        assert spark.table(table).groupBy("h", "doc_id").count() \
            .where("count > 1").count() == 0
        # compaction folds the cumulative per-append growth through
        # the metastore swap: <= buckets files after, rows identical,
        # probes unchanged
        rows_before = {(r.h, r.doc_id)
                       for r in spark.table(table).collect()}
        folded = compact_span_index(spark, bt_root)
        assert "windows" in folded and "admitted" in folded
        assert len(spark.table(table).inputFiles()) <= 4
        assert {(r.h, r.doc_id)
                for r in spark.table(table).collect()} == rows_before
        rej5, _ = _ingest(spark, bt_root, [(40, "a b c d e f g h")])
        assert rej5 == {40: "all_spans_duplicated"}
        # crash window: live table dropped, tmp present -> the next
        # open completes the rename and probes see the full index
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__fswap_tmp")
        rej6, _ = _ingest(spark, bt_root, [(41, "a b c d e f g h")])
        assert rej6 == {41: "all_spans_duplicated"}
        assert spark.catalog.tableExists(table)
        assert not spark.catalog.tableExists(f"{table}__fswap_tmp")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")


def test_torn_ctas_tmp_is_swept_not_wedged(spark, tmp_path):
    """A crash mid-write of the compaction's scratch CTAS leaves the
    tmp table's warehouse directory non-empty (_temporary staging)
    with NO catalog entry — DROP TABLE IF EXISTS alone is a no-op
    there and the next CTAS refuses the non-empty location, wedging
    compaction until manual cleanup (r13 ADVICE, medium). The swap
    must sweep the directory and proceed."""
    from urllib.parse import urlparse

    root = str(tmp_path / "sp_torn")
    table = "test_span_windows_torn"
    init_span_index(_df(spark, []), root, k=K,
                    windows_table=table, buckets=4)
    try:
        _ingest(spark, root, [(1, "a b c d e f g h")])
        wh = spark.conf.get("spark.sql.warehouse.dir")
        base = urlparse(wh).path or wh
        torn = os.path.join(base, f"{table}__fswap_tmp")
        os.makedirs(os.path.join(torn, "_temporary"), exist_ok=True)
        with open(os.path.join(torn, "part-torn.parquet"), "w") as f:
            f.write("junk")
        folded = compact_span_index(spark, root)
        assert "windows" in folded
        assert not os.path.exists(torn)
        rej, _ = _ingest(spark, root, [(2, "a b c d e f g h")])
        assert rej == {2: "all_spans_duplicated"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")


def test_streaming_twin_bootstraps_bucketed_tier(spark, tmp_path):
    """streaming_ingest_spans(windows_table=...) must bootstrap the
    metastore tier and converge like the plain twin."""
    src = str(tmp_path / "src_bt")
    root = str(tmp_path / "sidx_bt")
    table = "test_span_windows_stream"
    got = {}

    def on_admitted(df, batch_id):
        for r in df.collect():
            got[r.doc_id] = r.text

    os.makedirs(src)
    _df(spark, [(1, "a b c d e f g h")]).coalesce(1).write.parquet(
        src + "/b0")
    try:
        q = streaming_ingest_spans(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            root, str(tmp_path / "ck_bt"), k=K,
            on_admitted=on_admitted,
            windows_table=table, buckets=4,
        )
        try:
            q.processAllAvailable()
            _df(spark, [(2, "Q R a b c d e f g h S")]
                ).coalesce(1).write.parquet(src + "/b1")
            q.processAllAvailable()
        finally:
            q.stop()
        assert got == {1: "a b c d e f g h", 2: "Q R S"}
        assert spark.table(table).count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_twin_converges_with_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "sidx")
    ck = str(tmp_path / "ck")
    got = {}

    def on_admitted(df, batch_id):
        for r in df.collect():
            got[r.doc_id] = r.text

    os.makedirs(src)
    _df(spark, [(1, "a b c d e f g h")]).coalesce(1).write.parquet(
        src + "/b0")
    q = streaming_ingest_spans(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
        root, ck, k=K, on_admitted=on_admitted, compact_every=2,
    )
    try:
        q.processAllAvailable()
        _df(spark, [(2, "Q R a b c d e f g h S"),
                    (3, "totally new tokens only here")]
            ).coalesce(1).write.parquet(src + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()
    assert got[1] == "a b c d e f g h"
    assert got[2] == "Q R S"
    assert got[3] == "totally new tokens only here"
    admitted_ids = {r.doc_id for r in
                    spark.read.parquet(root + "/admitted").collect()}
    assert admitted_ids == {1, 2, 3}


def _force_replay(ck):
    commits = os.path.join(ck, "commits")
    newest = max(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(newest)))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_on_admitted_at_least_once_across_crash(spark, tmp_path):
    """The r13 documented caveat closed (r13 VERDICT #3): a crash
    AFTER the index appends but BEFORE the downstream commit replays
    the batch as already_admitted — the twin must recover the first
    run's rows (rewritten text included) from the persisted admitted
    dataset and hand them to on_admitted again, so an idempotent
    downstream sink keyed on doc_id converges to the batch-oracle
    survivor set instead of losing the batch."""
    src = str(tmp_path / "src_alo")
    root = str(tmp_path / "sidx_alo")
    ck = str(tmp_path / "ck_alo")
    sink: dict = {}

    def on_admitted(df, batch_id):
        for r in df.collect():
            sink[r.doc_id] = r.text

    def start():
        return streaming_ingest_spans(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            root, ck, k=K, on_admitted=on_admitted,
        )

    os.makedirs(src)
    _df(spark, [(1, "a b c d e f g h")]).coalesce(1).write.parquet(
        src + "/b0")
    q = start()
    try:
        q.processAllAvailable()
        _df(spark, [(2, "Q R a b c d e f g h S"),
                    (3, "totally new tokens only here")]
            ).coalesce(1).write.parquet(src + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()
    first = dict(sink)
    assert first == {1: "a b c d e f g h", 2: "Q R S",
                     3: "totally new tokens only here"}
    # crash simulation: the index appends committed but the DOWNSTREAM
    # lost batch 1's delivery, and the engine replays the batch
    _force_replay(ck)
    sink.pop(2)
    sink.pop(3)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == first, "replayed batch's rows were not re-delivered"
    # and the index did not duplicate anything on the replay
    adm = spark.read.parquet(root + "/admitted")
    assert adm.groupBy("doc_id").count().where("count > 1").count() == 0
