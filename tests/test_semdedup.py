"""SemDeDup tier (operators/semdedup.py): cell-blocked semantic
near-dup over embeddings. Contracts: precision 1 vs the brute-force
tier (every emitted pair re-verifies), recall ~1 at the production
near-dup regime on planted clusters, keep-set = connected-components
canonical, opt-in max_cell quarantine with ledger, top_m=1 blocking ==
the IVF cell assignment, numpy assignment == the literal-expression
arithmetic exactly, and the plan is propose-then-confirm: one cell
exchange into a per-cell gallery matmul, never a cross product."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.ivf import cell_of
from web3_flight_rpc_server_spark.operators.semdedup import (
    assign_top_cells,
    semantic_dedup_keep,
    semantic_neardup_pairs,
    top_cells,
)
from web3_flight_rpc_server_spark.operators.similarity import (
    neardup_pairs_bruteforce,
)

DIM = 16


def _corpus(spark, vectors):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _planted(n_clusters=4, per_cluster=5, noise=0.02, extra=10):
    """Clusters of near-identical unit vectors (pairwise cosine
    >= ~0.99) around well-separated random directions, plus isolated
    extras."""
    rng = np.random.default_rng(7)
    out = []
    for c in range(n_clusters):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + noise * rng.normal(size=DIM)
            out.append(v / np.linalg.norm(v))
    for _ in range(extra):
        v = rng.normal(size=DIM)
        out.append(v / np.linalg.norm(v))
    return out


def test_neardup_regime_recall_and_precision(spark):
    """At the SemDeDup operating point (cosine >= 0.9) near-identical
    vectors share cells and the blocked tier reproduces the
    brute-force pair set exactly on the planted corpus; precision is 1
    by construction (exact verify) so blocked is always a subset."""
    emb = _corpus(spark, _planted())
    blocked = {
        (r.d1, r.d2)
        for r in semantic_neardup_pairs(
            emb, threshold=0.9, n_cells=8, dim=DIM, top_m=2
        ).collect()
    }
    brute = {
        (r.d1, r.d2)
        for r in neardup_pairs_bruteforce(emb, threshold=0.9).collect()
    }
    assert blocked <= brute, "blocked tier emitted a false positive"
    # every planted cluster is 5 mutually-near vectors = 10 pairs
    assert len(brute) == 4 * 10
    recall = len(blocked) / len(brute)
    assert recall == 1.0, f"recall {recall} on planted near-identical pairs"


def test_keep_set_is_components_canonical(spark):
    """(id, keep, cluster_id): min id of each semantic cluster kept,
    other members dropped, isolated vectors kept with null cluster."""
    emb = _corpus(spark, _planted(n_clusters=2, per_cluster=3, extra=4))
    verdict = {r.vec_id: (r.keep, r.cluster_id)
               for r in semantic_dedup_keep(
                   emb, threshold=0.9, n_cells=8, dim=DIM).collect()}
    assert len(verdict) == 10
    # clusters are ids 0-2 and 3-5 by construction
    assert verdict[0] == (True, 0) and verdict[3] == (True, 3)
    for loser in (1, 2):
        assert verdict[loser] == (False, 0)
    for loser in (4, 5):
        assert verdict[loser] == (False, 3)
    for iso in (6, 7, 8, 9):
        assert verdict[iso] == (True, None)


def test_max_cell_quarantine_excludes_and_reports(spark):
    """An engineered hot cell (one direction duplicated past the cap)
    is excluded from the join and surfaced in the ledger; pairs in
    other cells are unaffected. The cap is OPT-IN for this tier —
    cells are expected to hold ~n/K vectors by construction (module
    docstring documents the divergence from the fingerprint tiers'
    default-on cap)."""
    rng = np.random.default_rng(11)
    hot_base = rng.normal(size=DIM)
    hot_base /= np.linalg.norm(hot_base)
    cold_base = -hot_base  # opposite direction: a different cell
    vecs = [hot_base + 0.01 * rng.normal(size=DIM) for _ in range(12)]
    vecs += [cold_base + 0.01 * rng.normal(size=DIM) for _ in range(3)]
    emb = _corpus(spark, [v / np.linalg.norm(v) for v in vecs])

    pairs, ledger = semantic_neardup_pairs(
        emb, threshold=0.9, n_cells=8, dim=DIM, top_m=1,
        max_cell=6, with_quarantine=True,
    )
    got = {(r.d1, r.d2) for r in pairs.collect()}
    led = ledger.collect()
    assert len(led) >= 1 and all(r.n_vectors > 6 for r in led)
    hot_cells = {r.cell for r in led}
    # expected = uncapped pairs minus those whose shared cell is hot
    # (derive membership from the same assignment the operator uses —
    # a noisy vector may legitimately fall in a neighboring cell)
    cell_by_id = {
        r.vec_id: r.cell
        for r in assign_top_cells(emb, 8, DIM, 1).collect()
    }
    uncapped = {
        (r.d1, r.d2)
        for r in semantic_neardup_pairs(
            emb, threshold=0.9, n_cells=8, dim=DIM, top_m=1).collect()
    }
    want = {
        (a, b) for (a, b) in uncapped
        if not (cell_by_id[a] in hot_cells and cell_by_id[a] == cell_by_id[b])
    }
    assert got == want, "cap must drop exactly the hot-cell pairs"
    # the engineered hot cluster really was capped: its pairs are
    # (mostly) gone from the capped result
    hot_pairs = {(a, b) for (a, b) in uncapped if a < 12 and b < 12}
    assert len(hot_pairs) >= 45
    assert len(hot_pairs & got) < len(hot_pairs) // 2
    # cold cluster fully intact
    cold = {(a, b) for (a, b) in uncapped if a >= 12 and b >= 12}
    assert cold and cold <= got


def test_top1_blocking_matches_ivf_cell(spark):
    """top_cells(..., top_m=1)[0] == operators/ivf.py:cell_of — the
    SemDeDup blocking at m=1 IS the IVF assignment (same anchors,
    same tie-break), which is what lets the partitioned ANN index
    double as the dedup blocking at rest."""
    rng = np.random.default_rng(3)
    emb = _corpus(spark, [rng.normal(size=DIM) for _ in range(200)])
    mismatch = emb.select(
        F.element_at(
            top_cells(F.col("embedding"), 8, DIM, 1), 1
        ).alias("m1"),
        cell_of(F.col("embedding"), 8, DIM).alias("ivf"),
    ).where(F.col("m1") != F.col("ivf"))
    assert mismatch.count() == 0


def test_plan_gallery_matmul_shape_no_cartesian(spark):
    """The propose-then-confirm shape: never a cross product; the
    corpus reaches the per-cell gallery matmul through exactly ONE
    cell exchange (the groupBy feeding FlatMapGroupsInPandas); the
    confirm stage re-scores only proposed pairs."""
    emb = _corpus(spark, _planted())
    pairs = semantic_neardup_pairs(emb, threshold=0.9, n_cells=8, dim=DIM)
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = pairs._jdf.queryExecution().explainString(fmt)
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, "gallery matmul stage missing"
    assert plan.count("hashpartitioning(cell") == 1, (
        "corpus must shuffle on the cell id exactly once"
    )


def test_top_m_multi_assignment_recovers_boundary_pairs(spark):
    """top_m=2 finds at least every pair top_m=1 finds, and on a loose
    threshold it strictly improves recall on this corpus (boundary
    pairs straddling two cells) — the multi-assignment lever the
    module documents."""
    rng = np.random.default_rng(5)
    emb = _corpus(spark, [rng.normal(size=DIM) for _ in range(150)])
    m1 = {(r.d1, r.d2) for r in semantic_neardup_pairs(
        emb, threshold=0.2, n_cells=8, dim=DIM, top_m=1).collect()}
    m2 = {(r.d1, r.d2) for r in semantic_neardup_pairs(
        emb, threshold=0.2, n_cells=8, dim=DIM, top_m=2).collect()}
    brute = {(r.d1, r.d2) for r in neardup_pairs_bruteforce(
        emb, threshold=0.2).collect()}
    assert m1 <= m2 <= brute
    assert len(m2) > len(m1), "top_m=2 added no boundary pairs"


def _blobs16(n_blobs, per_blob, spread, seed):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n_blobs, DIM)) * 2.0
    vecs = []
    for b in range(n_blobs):
        for _ in range(per_blob):
            vecs.append(means[b] + spread * rng.normal(size=DIM))
    return np.array(vecs)


def test_index_probe_equals_asymmetric_ground_truth(spark, tmp_path):
    """dedup_embeddings_against_index == the numpy definition of the
    asymmetric blocking: a (new, idx) pair is reported iff cosine >=
    threshold AND the index vector's at-rest cell is among the probe
    vector's top-m trained cells — and exactly once per pair."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        assign_trained_cells,
        kmeans_fit,
        write_trained_ivf_index,
    )
    from web3_flight_rpc_server_spark.operators.semdedup import (
        dedup_embeddings_against_index,
    )

    x = _blobs16(3, 30, 0.4, seed=31)
    idx_v, new_v = x[:60], x[60:]
    idx_emb = _corpus(spark, idx_v)
    new_emb = spark.createDataFrame(
        [(1000 + i, [float(v) for v in vec]) for i, vec in enumerate(new_v)],
        "vec_id long, embedding array<float>",
    )
    model = kmeans_fit(idx_emb, k=3, max_iter=8)
    path = str(tmp_path / "semidx")
    write_trained_ivf_index(idx_emb, model, path)

    thr = 0.8
    got = {
        (r.new_id, r.idx_id)
        for r in dedup_embeddings_against_index(
            new_emb, path, thr, top_m=2).collect()
    }
    # numpy ground truth on the stored float32 values
    xi = idx_v.astype(np.float32).astype(np.float64)
    xn = new_v.astype(np.float32).astype(np.float64)
    c = model.centroids
    idx_cell = np.argmin(
        ((xi[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1)
    d2n = ((xn[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    top2 = np.argsort(d2n, axis=1, kind="stable")[:, :2]
    cos = (xn @ xi.T) / (
        np.linalg.norm(xn, axis=1)[:, None]
        * np.linalg.norm(xi, axis=1)[None, :]
    )
    want = {
        (1000 + n, i)
        for n in range(len(xn))
        for i in range(len(xi))
        if cos[n, i] >= thr and idx_cell[i] in top2[n]
    }
    assert got == want
    # exactly one row per pair
    rows = dedup_embeddings_against_index(
        new_emb, path, thr, top_m=2).collect()
    assert len(rows) == len({(r.new_id, r.idx_id) for r in rows})
    # and the scan pruned to the probe cells at PLAN time — the
    # PartitionFilters entry must carry the literal probe-cell IN-list
    # (or a collapsed equality when one cell survives), not a
    # post-scan Filter (VERDICT r8 next-round #3)
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = dedup_embeddings_against_index(
        new_emb, path, thr, top_m=2
    )._jdf.queryExecution().explainString(fmt)
    assert any(
        "PartitionFilters" in ln and "cell" in ln
        and ("IN" in ln or "=" in ln)
        for ln in plan.splitlines()
    ), plan
    # exchange shape: the cogroup exchanges each side by cell exactly
    # once — two hashpartitioning(cell) exchanges, nothing else; the
    # index-side exchange input is the PRUNED scan (bounded by the
    # matched cells), which together with the PartitionFilters above
    # is the whole "index never fully re-shuffles" claim
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 2, plan
    part_args = [
        ln for ln in plan.splitlines()
        if ln.startswith("Arguments: hashpartitioning(cell")
    ]
    assert len(part_args) == 2, plan


def test_ingest_embeddings_two_batches_and_replay(spark, tmp_path):
    """The incremental loop: batch 2 is checked against batch 1's
    admitted vectors (index hit -> rejected), batch-internal dups
    resolve to the min id, fresh vectors append — and a crash-replay
    of batch 2 admits nothing and leaves the index unchanged."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        kmeans_fit,
        write_trained_ivf_index,
    )
    from web3_flight_rpc_server_spark.operators.semdedup import (
        ingest_embeddings,
    )

    rng = np.random.default_rng(41)
    base_a = rng.normal(size=DIM) * 2.0
    base_b = -base_a
    base_c = rng.normal(size=DIM) * 2.0 + 4.0

    def near(base, eps=0.01):
        return base + eps * rng.normal(size=DIM)

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(v) for v in vec]) for i, vec in rows],
            "vec_id long, embedding array<float>",
        )

    b1 = mk([(1, near(base_a)), (2, near(base_b))])
    # the model can be trained on any representative corpus; use b1
    model = kmeans_fit(b1, k=2, max_iter=5)
    path = str(tmp_path / "ingidx")
    write_trained_ivf_index(
        spark.createDataFrame([], b1.schema), model, path)

    adm1, dups1 = ingest_embeddings(b1, path, threshold=0.95)
    assert {r.vec_id for r in adm1.collect()} == {1, 2}
    assert dups1.isEmpty()

    b2 = mk([
        (10, near(base_a)),   # dup of kept 1 -> index hit
        (11, near(base_c)),   # fresh direction
        (12, near(base_c)),   # batch-internal dup of 11 (loses to min)
    ])
    adm2, dups2 = ingest_embeddings(b2, path, threshold=0.95)
    assert {r.vec_id for r in adm2.collect()} == {11}
    pair_ids = {(r.new_id, r.idx_id) for r in dups2.collect()}
    assert pair_ids == {(10, 1), (12, 11)}
    spark.catalog.refreshByPath(path)
    on_disk = {r.vec_id for r in
               spark.read.parquet(path).select("vec_id").collect()}
    assert on_disk == {1, 2, 11}

    # crash-replay of batch 2: everything collides at cosine ~1,
    # nothing re-admits, index unchanged
    adm2r, dups2r = ingest_embeddings(b2, path, threshold=0.95)
    assert adm2r.isEmpty()
    replay_pairs = {(r.new_id, r.idx_id) for r in dups2r.collect()}
    assert (10, 1) in replay_pairs and (11, 11) in replay_pairs
    assert (12, 11) in replay_pairs
    spark.catalog.refreshByPath(path)
    assert {r.vec_id for r in
            spark.read.parquet(path).select("vec_id").collect()
            } == {1, 2, 11}


def test_streaming_ingest_embeddings(spark, tmp_path):
    """Stream twin: bootstraps an empty trained index from the given
    model, admits non-dups across micro-batches, rejects a later
    batch's semantic dup of an earlier batch's survivor, and hands
    survivors to on_admitted."""
    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit
    from web3_flight_rpc_server_spark.operators.semdedup import (
        streaming_ingest_embeddings,
    )

    rng = np.random.default_rng(51)
    base_a = rng.normal(size=DIM) * 2.0
    base_b = -base_a

    def near(base, eps=0.01):
        return [float(v) for v in base + eps * rng.normal(size=DIM)]

    path = str(tmp_path / "semidx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"
    b1 = spark.createDataFrame(
        [(1, near(base_a)), (2, near(base_a)), (3, near(base_b))], schema
    )
    b1.write.parquet(src)
    sample = b1  # representative enough for the 2-direction fixture
    model = kmeans_fit(sample, k=2, max_iter=5)

    seen = []

    def on_admitted(df, batch_id):
        seen.append({r.vec_id for r in df.collect()})

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_ingest_embeddings(
        stream, path, ckpt, threshold=0.95, model=model,
        on_admitted=on_admitted,
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(10, near(base_a)), (11, near(base_b + 8.0))], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    admitted_all = set().union(*seen)
    # batch 1: 1+2 internal pair (min wins) + 3; batch 2: 10 collides
    # with indexed 1, 11 is a fresh direction
    assert admitted_all == {1, 3, 11}
    spark.catalog.refreshByPath(path)
    assert {r.vec_id for r in
            spark.read.parquet(path).select("vec_id").collect()
            } == {1, 3, 11}


def test_streaming_ingest_auto_compaction(spark, tmp_path):
    """compact_every=N folds the per-batch appended small files inside
    the foreachBatch cycle (micro-batches are serial, so compaction
    never races an append by construction): after several batches the
    data-file count is bounded by the compaction, probes stay correct,
    and later batches still dedup against everything admitted before
    the compaction."""
    import os

    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit
    from web3_flight_rpc_server_spark.operators.semdedup import (
        streaming_ingest_embeddings,
    )

    rng = np.random.default_rng(57)
    base_a = rng.normal(size=DIM) * 2.0
    base_b = -base_a

    def near(base, eps=0.01):
        return [float(v) for v in base + eps * rng.normal(size=DIM)]

    path = str(tmp_path / "semidx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"
    b1 = spark.createDataFrame(
        [(1, near(base_a)), (2, near(base_b))], schema
    )
    b1.write.parquet(src)
    model = kmeans_fit(b1, k=2, max_iter=5)

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_ingest_embeddings(
        stream, path, ckpt, threshold=0.95, model=model, compact_every=1,
    )

    def n_files():
        n = 0
        for root, _dirs, files in os.walk(path):
            if "_kmeans_manifest" in root or ".compacting" in root:
                continue
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    try:
        q.processAllAvailable()
        for i in range(3):  # three more batches, each a fresh direction
            fresh = rng.normal(size=DIM) * (3.0 + i)
            spark.createDataFrame(
                [(100 + i, [float(v) for v in fresh])], schema
            ).write.mode("append").parquet(src)
            q.processAllAvailable()
        compacted_files = n_files()
        # a semantic dup of batch 1's survivor must still be rejected
        # AFTER compactions (the folded index is the same row set)
        spark.createDataFrame(
            [(500, near(base_a))], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    spark.catalog.refreshByPath(path)
    ids = {r.vec_id for r in
           spark.read.parquet(path).select("vec_id").collect()}
    assert ids == {1, 2, 100, 101, 102}, ids
    # every cell folded to one file per compaction pass: the count is
    # bounded by live cells (+1 for the post-compaction 500-reject
    # cycle's no-op), NOT by the number of batches
    assert compacted_files <= model.k, compacted_files


def test_numpy_assignment_matches_expression_exactly(spark):
    """assign_top_cells' Arrow/numpy fold must agree with the
    top_cells literal-expression form EXACTLY (same IEEE ops, same
    order, same tie-break) — untrained anchors AND trained centroids —
    because the DuckDB oracle derives the blocking from the expression
    arithmetic."""
    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit

    rng = np.random.default_rng(61)
    emb = _corpus(spark, [rng.normal(size=DIM) for _ in range(300)])
    for centroids in (None, kmeans_fit(emb, k=5, max_iter=4)):
        got = {
            (r.vec_id, r.cell)
            for r in assign_top_cells(
                emb, 8, DIM, 2, centroids=centroids).collect()
        }
        want = {
            (r.vec_id, r.cell)
            for r in emb.select(
                "vec_id",
                F.explode(
                    top_cells(F.col("embedding"), 8, DIM, 2, centroids)
                ).alias("cell"),
            ).collect()
        }
        assert got == want, (
            "numpy and expression assignments diverged "
            f"(trained={centroids is not None})"
        )


def test_on_admitted_at_least_once_across_crash(spark, tmp_path):
    """r13 VERDICT #3: a crash after the index append but before the
    downstream commit replays the batch; previously-admitted vectors
    self-match the index (new_id == idx_id at cosine 1.0) and must be
    re-handed to on_admitted, so an idempotent downstream sink
    converges instead of losing the batch."""
    import os

    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit
    from web3_flight_rpc_server_spark.operators.semdedup import (
        streaming_ingest_embeddings,
    )

    rng = np.random.default_rng(77)
    base_a = rng.normal(size=DIM) * 2.0
    base_b = -base_a

    def near(base, eps=0.01):
        return [float(v) for v in base + eps * rng.normal(size=DIM)]

    path = str(tmp_path / "semidx_alo")
    src = str(tmp_path / "src_alo")
    ck = str(tmp_path / "ck_alo")
    schema = "vec_id long, embedding array<float>"
    os.makedirs(src)
    b0 = spark.createDataFrame([(1, near(base_a))], schema)
    b0.coalesce(1).write.parquet(src + "/b0")
    model = kmeans_fit(
        spark.createDataFrame(
            [(1, near(base_a)), (2, near(base_b))], schema
        ), k=2, max_iter=5,
    )
    sink: set = set()

    def on_admitted(df, batch_id):
        sink.update(r.vec_id for r in df.collect())

    def start():
        return streaming_ingest_embeddings(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*"),
            path, ck, threshold=0.95, model=model,
            on_admitted=on_admitted,
        )

    q = start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(10, near(base_b))], schema
        ).coalesce(1).write.parquet(src + "/b1")
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 10}
    commits = os.path.join(ck, "commits")
    newest = max(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(newest)))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    sink.discard(10)  # downstream lost batch 1's delivery
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sink == {1, 10}, "replayed ids were not re-delivered"
    spark.catalog.refreshByPath(path)
    idx = spark.read.parquet(path)
    assert idx.groupBy("vec_id", "cell").count() \
        .where("count > 1").count() == 0
