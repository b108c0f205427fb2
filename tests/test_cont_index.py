"""Persistent containment index (operators/cont_index.py): incremental
quoted-extract checking against an indexed corpus — the index twin of
containment_pairs_blocked, closing the batch+index+stream pattern for
the containment family (r13 VERDICT #4). Contracts mirror
tests/test_fp_index.py: probe == one-shot cross pairs, manifest-pinned
layout refusal, idempotent crash-replay appends, stop-fingerprint cap,
compaction invisibility, probe-side-only shuffle on the bucketed tier,
at-least-once on_admitted."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.cont_index import (
    compact_containment_index,
    cont_index_hot_fps,
    containment_against_index,
    ingest_containment_batch,
    streaming_ingest_containment,
    write_containment_index,
)
from web3_flight_rpc_server_spark.operators.dedup import release_caches
from web3_flight_rpc_server_spark.operators.winnowing import (
    containment_pairs_blocked,
)

T = 0.8


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _doc(uid: int, n_tok: int = 30) -> str:
    return " ".join(f"w{uid}tok{j}word" for j in range(n_tok))


def _quote(host_uid: int, quoted: str, pad: int = 60) -> str:
    """A long host doc quoting ``quoted`` verbatim in the middle."""
    left = " ".join(f"h{host_uid}pre{j}text" for j in range(pad))
    right = " ".join(f"h{host_uid}post{j}text" for j in range(pad))
    return f"{left} {quoted} {right}"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_equals_one_shot_cross_pairs(spark, tmp_path):
    """Index half a planted corpus, probe the other half: the directed
    (src, dst) pairs must equal exactly the one-shot
    containment_pairs_blocked pairs over the union that cross the
    split (max_df slack so the cap binds identically: not at all)."""
    quoted = _doc(1)
    old = [(1, quoted), (2, _doc(2)), (3, _quote(3, _doc(2)))]
    new = [(10, _quote(10, quoted)), (11, _doc(11)),
           (12, _doc(2))]  # 12 = exact copy of indexed 2
    path = str(tmp_path / "cidx")
    write_containment_index(_df(spark, old), path, max_df=1000)
    got = {(r.src, r.dst, round(r.containment, 6))
           for r in containment_against_index(
               _df(spark, new), path, T).collect()}
    both = containment_pairs_blocked(
        _df(spark, old + new), T, max_df=1000
    )
    old_ids = {1, 2, 3}
    want = {(r.src, r.dst, round(r.containment, 6))
            for r in both.collect()
            if (r.src in old_ids) != (r.dst in old_ids)}
    assert got == want and got
    # the quoted-extract class: indexed 1 contained in new host 10,
    # and the exact copy pairs both ways
    assert any(s == 1 and d == 10 for s, d, _ in got)
    assert any(s == 12 and d == 2 for s, d, _ in got)


def test_layout_pinned_and_refusals(spark, tmp_path):
    path = str(tmp_path / "cidx")
    write_containment_index(_df(spark, [(1, _doc(1))]), path, k=10, w=4)
    with pytest.raises(ValueError, match=r"\(n, k, w\)"):
        write_containment_index(_df(spark, [(2, _doc(2))]), path,
                                k=12, append=True)
    # None args on append mean "use the manifest": accepted
    write_containment_index(_df(spark, [(2, _doc(2))]), path,
                            append=True)
    # probe-behavior knobs are manifest-pinned too: an explicitly
    # mismatched cap/floor/hash request refuses instead of being
    # silently dropped
    with pytest.raises(ValueError, match="max_df"):
        write_containment_index(_df(spark, [(4, _doc(4))]), path,
                                max_df=9, append=True)
    with pytest.raises(ValueError, match="min_shared"):
        write_containment_index(_df(spark, [(4, _doc(4))]), path,
                                min_shared=7, append=True)
    with pytest.raises(ValueError, match="hash tier"):
        write_containment_index(_df(spark, [(4, _doc(4))]), path,
                                hash="md5_prefix60", append=True)
    with pytest.raises(FileNotFoundError, match="no containment index"):
        containment_against_index(
            _df(spark, [(9, _doc(9))]), str(tmp_path / "nope"), T)
    with pytest.raises(ValueError, match="hash tier"):
        write_containment_index(_df(spark, [(3, _doc(3))]),
                                str(tmp_path / "cidx2"), hash="sha9")


def test_append_idempotent_across_replay(spark, tmp_path):
    """Re-appending the same batch (a crash-replay) must not duplicate
    fp rows, shingle rows, or inflate the df deltas."""
    path = str(tmp_path / "cidx")
    write_containment_index(_df(spark, [(1, _doc(1))]), path)
    batch = _df(spark, [(2, _doc(2)), (3, _doc(3))])
    write_containment_index(batch, path, append=True)
    write_containment_index(batch, path, append=True)  # replay
    fps = spark.read.parquet(f"{path}/fps")
    assert fps.groupBy("fp", "doc_id").count() \
        .where("count > 1").count() == 0
    sh = spark.read.parquet(f"{path}/shingles")
    assert sh.groupBy("doc_id").count().where("count > 1").count() == 0
    # df deltas equal a direct recount of fps/
    truth = {r.fp: r["count"] for r in
             fps.groupBy("fp").count().collect()}
    folded = {r.fp: r.df for r in
              spark.read.parquet(f"{path}/fp_stats")
              .groupBy("fp").agg(F.sum("n").alias("df")).collect()}
    assert folded == truth


def test_stop_fingerprint_cap_excludes_boilerplate(spark, tmp_path):
    """A fingerprint indexed in more than max_df docs (boilerplate) is
    excluded from probes; pairs reachable only through it are not
    proposed, pairs with rare shared content still are."""
    boiler = "common license header boilerplate phrase repeated"
    pile = [(i, f"{_doc(i, 8)} {boiler}") for i in range(10)]
    rare_host = (100, _quote(100, _doc(50)))
    path = str(tmp_path / "cidx")
    write_containment_index(
        _df(spark, pile + [rare_host]), path, max_df=5,
    )
    hot = cont_index_hot_fps(spark, path)
    assert hot.count() > 0
    probe = _df(spark, [(200, f"{_doc(200, 8)} {boiler}"),
                        (201, _doc(50))])
    got = {(r.src, r.dst) for r in containment_against_index(
        probe, path, T).collect()}
    # 201 is the quoted extract of the rare host's middle -> found;
    # 200 shares only the over-cap boilerplate -> not proposed
    assert (201, 100) in got
    assert all(s != 200 and d != 200 for s, d in got)


def test_ingest_loop_admits_and_rejects(spark, tmp_path):
    """Two ingest cycles: a batch doc quoted inside an indexed doc is
    rejected, batch-internal containment resolves (contained side
    loses, mutual keeps the min id), survivors are probe-visible to
    the next batch; an indexed doc contained in an ADMITTED new doc is
    audit-only (the new doc carries novel content)."""
    quoted = _doc(1)
    path = str(tmp_path / "cidx")
    write_containment_index(
        _df(spark, [(1, quoted), (2, _quote(2, _doc(7)))]), path,
    )
    batch = _df(spark, [
        (10, quoted),                 # exact copy of indexed 1
        (11, _doc(11)),               # fresh
        (12, _quote(12, _doc(11))),   # host quoting 11 (in-batch)
        (13, _doc(7)),                # contained in indexed host 2
    ])
    admitted, dups = ingest_containment_batch(batch, path, T)
    got = {r.doc_id for r in admitted.collect()}
    # 10 rejected (contained in indexed 1); 13 rejected (contained in
    # indexed host 2); 11 contained in in-batch host 12 -> 11 loses
    # batch-internally; 12 admitted
    assert got == {12}
    pair_set = {(r.src, r.dst) for r in dups.collect()}
    assert (11, 12) in pair_set and (10, 1) in pair_set \
        and (13, 2) in pair_set
    # next batch sees this batch's survivor
    admitted2, dups2 = ingest_containment_batch(
        _df(spark, [(20, _doc(11))]), path, T)
    # 20 == the extract quoted in now-indexed 12
    assert admitted2.isEmpty()
    assert any(r.src == 20 and r.dst == 12 for r in dups2.collect())


def test_ingest_replay_converges_and_redelivers(spark, tmp_path):
    """A replayed ingest cycle re-derives the same admitted set
    (self-exclusion: the index rows the first run appended are owned
    by the probing docs and never pair) and appends nothing twice —
    the at-least-once delivery story by construction."""
    path = str(tmp_path / "cidx")
    write_containment_index(_df(spark, [(1, _doc(1))]), path)
    batch = _df(spark, [(10, _quote(10, _doc(1))), (11, _doc(11))])
    a1, _ = ingest_containment_batch(batch, path, T)
    first = {r.doc_id for r in a1.collect()}
    a2, _ = ingest_containment_batch(batch, path, T)  # replay
    assert {r.doc_id for r in a2.collect()} == first == {10, 11}
    fps = spark.read.parquet(f"{path}/fps")
    assert fps.groupBy("fp", "doc_id").count() \
        .where("count > 1").count() == 0


def test_compaction_is_invisible_to_probes(spark, tmp_path):
    path = str(tmp_path / "cidx")
    write_containment_index(_df(spark, [(1, _doc(1))]), path)
    for j in range(3):
        write_containment_index(
            _df(spark, [(10 + j, _doc(10 + j))]), path, append=True)
    probe = _df(spark, [(200, _quote(200, _doc(1))),
                        (201, _doc(11))])
    before = {(r.src, r.dst, round(r.containment, 6))
              for r in containment_against_index(
                  probe, path, T).collect()}
    stats = compact_containment_index(spark, path)
    assert stats["fps"][1] <= stats["fps"][0]
    after = {(r.src, r.dst, round(r.containment, 6))
             for r in containment_against_index(
                 probe, path, T).collect()}
    assert after == before and before


def test_bucketed_fps_tier_no_exchange_and_compaction(spark, tmp_path):
    """The metastore bucketed-fps tier: the probe join must shuffle
    ONLY the probe side with identical pairs to the plain tier;
    in-loop compaction folds to <= buckets files with probes
    bit-identical; both crash windows self-heal (live dropped with
    tmp present; torn tmp CTAS swept)."""
    from urllib.parse import urlparse

    quoted = _doc(1)
    old = [(1, quoted), (2, _doc(2))]
    probe_rows = [(10, _quote(10, quoted)), (11, _doc(2))]
    plain = str(tmp_path / "cidx_plain")
    bt = str(tmp_path / "cidx_bt")
    table = "test_cont_fps_bt"
    write_containment_index(_df(spark, old), plain)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_containment_index(_df(spark, old), bt,
                                fps_table=table, buckets=4)
        for j in range(3):
            write_containment_index(
                _df(spark, [(30 + j, _doc(30 + j))]), bt, append=True)
            write_containment_index(
                _df(spark, [(30 + j, _doc(30 + j))]), plain,
                append=True)
        probe = containment_against_index(_df(spark, probe_rows), bt, T)
        fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = probe._jdf.queryExecution().explainString(fmt)
        assert "Bucketed: true" in plan, "index side not read bucketed"
        # the fwd/rev union reads the PERSISTED confirm frame, so the
        # propose join plans once; it carries the (tiny) fp_stats
        # hot-set aggregation exchange + the probe-side exchange = 2
        # fp exchanges total, and NONE over the index scan. The plain
        # tier adds the index-side exchange = 3.
        plain_probe = containment_against_index(
            _df(spark, probe_rows), plain, T)
        plain_plan = plain_probe._jdf.queryExecution() \
            .explainString(fmt)
        assert plan.count("hashpartitioning(fp") == 2, plan
        assert plain_plan.count("hashpartitioning(fp") == 3, plain_plan
        got = {(r.src, r.dst, round(r.containment, 6))
               for r in probe.collect()}
        want = {(r.src, r.dst, round(r.containment, 6))
                for r in plain_probe.collect()}
        assert got == want and got
        # in-loop fold: <= buckets files, probes identical
        res = compact_containment_index(spark, bt)
        n_after = len(spark.table(table).inputFiles())
        assert n_after <= 4 and n_after <= res["fps"][0]
        assert {(r.src, r.dst, round(r.containment, 6))
                for r in containment_against_index(
                    _df(spark, probe_rows), bt, T).collect()} == got
        # crash window: live dropped, tmp present -> rename completes
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__fswap_tmp")
        assert {(r.src, r.dst, round(r.containment, 6))
                for r in containment_against_index(
                    _df(spark, probe_rows), bt, T).collect()} == got
        assert spark.catalog.tableExists(table)
        # crash window: torn tmp CTAS directory swept, not wedged
        wh = spark.conf.get("spark.sql.warehouse.dir")
        base = urlparse(wh).path or wh
        torn = os.path.join(base, f"{table}__fswap_tmp")
        os.makedirs(os.path.join(torn, "_temporary"), exist_ok=True)
        with open(os.path.join(torn, "part-torn.parquet"), "w") as f:
            f.write("junk")
        res2 = compact_containment_index(spark, bt)
        assert "fps" in res2 and not os.path.exists(torn)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")


def test_streaming_twin_with_forced_replay(spark, tmp_path):
    """The streaming loop: bootstraps an empty index, rejects a later
    batch's quoted extract of an earlier survivor, keeps file counts
    bounded via compact_every, and delivers on_admitted at-least-once
    across a forced engine replay where the downstream lost the
    batch."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "cidx")
    ck = str(tmp_path / "ck")
    sink: set = set()

    def on_admitted(df, batch_id):
        sink.update(r.doc_id for r in df.collect())

    def start():
        return streaming_ingest_containment(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            path, ck, threshold=T, on_admitted=on_admitted,
            compact_every=2,
        )

    os.makedirs(src)
    _df(spark, [(1, _doc(1))]).coalesce(1).write.parquet(src + "/b0")
    q = start()
    try:
        q.processAllAvailable()
        _df(spark, [(2, _doc(1)),          # exact copy of survivor 1
                    (3, _doc(3))]).coalesce(1).write.parquet(
            src + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 3}
    # forced replay + downstream loses batch 1's delivery
    commits = os.path.join(ck, "commits")
    newest = max(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(newest)))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    sink.discard(3)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 3}, "replayed batch's ids were not re-delivered"
    fps = spark.read.parquet(f"{path}/fps")
    assert fps.groupBy("fp", "doc_id").count() \
        .where("count > 1").count() == 0
    assert {r.doc_id for r in
            spark.read.parquet(f"{path}/shingles")
            .select("doc_id").collect()} == {1, 3}


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_probe_cross_parity_fuzz(spark, tmp_path, seed):
    """Seeded generated corpora (hosts quoting extracts, exact copies,
    fresh docs): the index probe over a random split must equal the
    one-shot composition's cross-split pairs exactly — the
    q_substring_dedup 3-seed fuzz convention applied to the new
    tier."""
    import random

    rng = random.Random(seed)
    rows = []
    extracts = {}
    for i in range(30):
        kind = rng.random()
        if kind < 0.3 and extracts:
            src = rng.choice(sorted(extracts))
            rows.append((i, _quote(i, extracts[src], pad=rng.randint(20, 50))))
        elif kind < 0.4 and extracts:
            src = rng.choice(sorted(extracts))
            rows.append((i, extracts[src]))  # exact copy
        else:
            t = _doc(i, rng.randint(12, 40))
            extracts[i] = t
            rows.append((i, t))
    idx_rows = [r for r in rows if r[0] % 2 == 0]
    probe_rows = [r for r in rows if r[0] % 2 == 1]
    path = str(tmp_path / f"cidx_fuzz_{seed}")
    write_containment_index(_df(spark, idx_rows), path, max_df=1000)
    got = {(r.src, r.dst, round(r.containment, 6))
           for r in containment_against_index(
               _df(spark, probe_rows), path, T).collect()}
    both = containment_pairs_blocked(
        _df(spark, rows), T, max_df=1000
    )
    idx_ids = {r[0] for r in idx_rows}
    want = {(r.src, r.dst, round(r.containment, 6))
            for r in both.collect()
            if (r.src in idx_ids) != (r.dst in idx_ids)}
    assert got == want


def test_streaming_twin_bootstraps_bucketed_tier(spark, tmp_path):
    """streaming_ingest_containment(fps_table=...) must bootstrap the
    metastore tier and converge like the plain twin, with the fps
    rows landing in the table."""
    src = str(tmp_path / "src_bt")
    path = str(tmp_path / "cidx_bt")
    table = "test_cont_fps_stream"
    sink: set = set()

    os.makedirs(src)
    _df(spark, [(1, _doc(1))]).coalesce(1).write.parquet(src + "/b0")
    try:
        q = streaming_ingest_containment(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            path, str(tmp_path / "ck_bt"), threshold=T,
            on_admitted=lambda df, bid: sink.update(
                r.doc_id for r in df.collect()
            ),
            fps_table=table, buckets=4, compact_every=2,
        )
        try:
            q.processAllAvailable()
            _df(spark, [(2, _doc(1)), (3, _doc(3))]
                ).coalesce(1).write.parquet(src + "/b1")
            q.processAllAvailable()
        finally:
            q.stop()
        assert sink == {1, 3}
        assert spark.table(table).count() > 0
        assert spark.table(table).select("doc_id").distinct().count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__fswap_tmp")
