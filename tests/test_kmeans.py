"""Distributed Lloyd's k-means (operators/kmeans.py): recovers
planted blobs, matches a numpy reference run from the same init,
tolerates empty cells, assigns consistently across its three
assignment surfaces (fit pass / assign_trained_cells /
trained_cell_scores literals), and measurably improves SemDeDup
blocking recall over untrained anchors on a clustered corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.kmeans import (
    KMeansModel,
    assign_trained_cells,
    kmeans_fit,
    trained_cell_scores,
)
from web3_flight_rpc_server_spark.operators.semdedup import (
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


def _blobs(n_blobs=4, per_blob=40, spread=0.05, seed=2):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n_blobs, DIM)) * 2.0
    vecs, labels = [], []
    for b in range(n_blobs):
        for _ in range(per_blob):
            vecs.append(means[b] + spread * rng.normal(size=DIM))
            labels.append(b)
    return means, np.array(vecs), labels


def _numpy_lloyd(x, init, iters):
    c = init.copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cell = np.argmin(d2, axis=1)
        for j in range(len(c)):
            if (cell == j).any():
                c[j] = x[cell == j].mean(axis=0)
    return c


def test_recovers_planted_blobs(spark):
    means, x, _ = _blobs()
    model = kmeans_fit(_corpus(spark, x), k=4, max_iter=15, tol=1e-6)
    assert model.n_iter <= 15 and np.isfinite(model.inertia)
    # every true mean has a fitted centroid within a fraction of the
    # blob spread (float32 storage costs ~1e-7, Lloyd noise ~spread/n)
    d = np.sqrt(
        ((means[:, None, :] - model.centroids[None, :, :]) ** 2).sum(axis=2)
    )
    assert (d.min(axis=1) < 0.05).all(), d.min(axis=1)
    # k distinct centroids (no collapsed/duplicate cells on blobs)
    assert len({tuple(np.round(c, 6)) for c in model.centroids}) == 4


def test_matches_numpy_lloyd_from_same_init(spark):
    _, x, _ = _blobs(n_blobs=3, per_blob=25, seed=5)
    x32 = x.astype(np.float32).astype(np.float64)  # what Spark stores
    init = x32[[0, 30, 60]]
    model = kmeans_fit(
        _corpus(spark, x), k=3, max_iter=4, tol=0.0, init=init
    )
    ref = _numpy_lloyd(x32, init, model.n_iter)
    assert np.allclose(model.centroids, ref, atol=1e-9), (
        np.abs(model.centroids - ref).max()
    )


def test_empty_cell_keeps_centroid(spark):
    _, x, _ = _blobs(n_blobs=2, per_blob=20, seed=9)
    far = np.full(DIM, 100.0)
    init = np.vstack([x[0], x[25], far])
    model = kmeans_fit(
        _corpus(spark, x), k=3, max_iter=5, tol=0.0, init=init
    )
    assert np.isfinite(model.centroids).all()
    assert np.allclose(model.centroids[2], far), (
        "empty cell must keep its previous centroid, not NaN or drift"
    )


def test_assignment_surfaces_agree(spark):
    means, x, _ = _blobs(seed=13)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=4, max_iter=8)
    rows = assign_trained_cells(emb, model).select(
        "vec_id", "embedding", "cell"
    ).collect()
    # numpy reference argmin on the same float32-stored vectors
    c = model.centroids
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        want = int(np.argmin(((v - c) ** 2).sum(axis=1)))
        assert r.cell == want
    # the literal-expression score path picks the same cell
    lit = emb.select(
        "vec_id",
        F.element_at(
            top_cells(F.col("embedding"), top_m=1, centroids=model), 1
        ).alias("cell"),
    ).collect()
    lit_by_id = {r.vec_id: r.cell for r in lit}
    for r in rows:
        assert lit_by_id[r.vec_id] == r.cell


def test_trained_blocking_beats_untrained_anchors(spark):
    """The measurable SemDeDup claim: on a CLUSTERED corpus at a
    semantic (not near-identical) threshold, trained centroids put
    each cluster in one cell — blocking recall 1.0 at top_m=1 — while
    the untrained pseudo-random anchors split clusters across cells
    and miss pairs."""
    rng = np.random.default_rng(21)
    means = rng.normal(size=(5, DIM))
    means = 1.2 * means / np.linalg.norm(means, axis=1, keepdims=True)
    vecs, labels = [], []
    for b in range(5):
        for _ in range(30):
            vecs.append(means[b] + 0.3 * rng.normal(size=DIM))
            labels.append(b)
    emb = _corpus(spark, np.array(vecs))
    thr = 0.6
    brute = {(r.d1, r.d2) for r in
             neardup_pairs_bruteforce(emb, threshold=thr).collect()}
    # recall is judged on INTRA-cluster pairs — inter-cluster pairs
    # above the threshold exist on this fixture and NO within-cell
    # blocking (trained or not) can see them; that is the documented
    # SemDeDup trade, not a blocking-quality signal
    intra = {(a, b) for (a, b) in brute if labels[a] == labels[b]}
    assert len(intra) > 300, "fixture must have intra-cluster pairs"
    model = kmeans_fit(emb, k=5, max_iter=10)
    trained = {(r.d1, r.d2) for r in semantic_neardup_pairs(
        emb, threshold=thr, dim=DIM, top_m=1, centroids=model).collect()}
    untrained = {(r.d1, r.d2) for r in semantic_neardup_pairs(
        emb, threshold=thr, n_cells=5, dim=DIM, top_m=1).collect()}
    assert trained <= brute and untrained <= brute
    r_trained = len(trained & intra) / len(intra)
    r_untrained = len(untrained & intra) / len(intra)
    # measured 0.99 vs 0.71 on this fixture; floors leave noise room
    assert r_trained > r_untrained, (r_trained, r_untrained)
    assert r_trained >= 0.95, r_trained
    assert r_untrained <= 0.85, r_untrained


def test_trained_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    """write_trained_ivf_index + trained_ivf_topk: full probe equals
    the exact brute-force top-k; partial probe equals the
    cell-restricted exact ranking; the probe list prunes partitions at
    PLAN time (PartitionFilters in the formatted explain); appends
    land in the manifest's cells and a retrained model is refused."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        read_trained_ivf_manifest,
        trained_ivf_topk,
        trained_probe_cells,
        write_trained_ivf_index,
    )
    from web3_flight_rpc_server_spark.operators.similarity import (
        cosine_topk,
    )

    means, x, _ = _blobs(n_blobs=4, per_blob=30, seed=17)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=4, max_iter=8)
    path = str(tmp_path / "tivf")
    write_trained_ivf_index(emb, model, path)

    # the corpus stores float32 — feed BOTH paths the same stored
    # precision or the cosines differ in the last ulp
    qv = [float(np.float32(v)) for v in x[0]]
    qdf = _corpus(spark, [x[0]]).select("embedding")
    exact = [
        (r.vec_id, round(r.cos, 9))
        for r in cosine_topk(emb, qdf, k=10, dim=DIM).collect()
    ]
    full = trained_ivf_topk(spark, path, qv, k=10, n_probe=model.k)
    got = [(r.vec_id, round(r.cos, 9)) for r in full.collect()]
    assert got == exact

    partial = trained_ivf_topk(spark, path, qv, k=10, n_probe=1)
    probes = trained_probe_cells(qv, model, 1)
    cells = assign_trained_cells(emb, model).select("vec_id", "cell")
    allowed = {r.vec_id for r in cells.collect() if r.cell in probes}
    assert {r.vec_id for r in partial.collect()} <= allowed
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = partial._jdf.queryExecution().explainString(fmt)
    # the scan itself must report the IN filter on the partition
    # column — pruning at plan time, not a post-scan Filter
    assert any(
        "PartitionFilters" in ln and "cell" in ln
        and ("IN" in ln or "=" in ln)
        for ln in plan.splitlines()
    ), plan

    # append under the manifest's centroids: new rows land in the
    # same cells a one-shot build would choose
    extra = _corpus(spark, x[:5] + 10.0)  # shifted copies, ids 0-4
    extra = extra.withColumn("vec_id", F.col("vec_id") + 1000)
    write_trained_ivf_index(extra, model, path, append=True)
    m2, vcol = read_trained_ivf_manifest(spark, path)
    assert vcol == "embedding"
    assert np.array_equal(m2.centroids, model.centroids)
    spark.catalog.refreshByPath(path)
    on_disk = spark.read.parquet(path)
    want = {
        r.vec_id: r.cell
        for r in assign_trained_cells(
            extra, model).select("vec_id", "cell").collect()
    }
    got_cells = {
        r.vec_id: r.cell
        for r in on_disk.where(F.col("vec_id") >= 1000)
        .select("vec_id", "cell").collect()
    }
    assert got_cells == want

    # retrained (different) centroids are refused on append
    retrained = KMeansModel(model.centroids + 0.5, 1, 0.0, 0.0)
    with pytest.raises(ValueError, match="different centroids"):
        write_trained_ivf_index(extra, retrained, path, append=True)


def _probe_snapshot(spark, path, probe_df, threshold=0.6):
    from web3_flight_rpc_server_spark.operators.semdedup import (
        dedup_embeddings_against_index,
    )

    return {
        (r.new_id, r.idx_id, r.cos)  # exact floats — bit parity
        for r in dedup_embeddings_against_index(
            probe_df, path, threshold=threshold
        ).collect()
    }


def _count_data_files(path):
    import os

    n = 0
    for root, _dirs, files in os.walk(path):
        if "_kmeans_manifest" in root or ".compacting" in root:
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compact_trained_index_probe_bit_identical(spark, tmp_path):
    """compact_trained_ivf_index folds an append-heavy trained index's
    small files while preserving the manifest, the cell partitioning,
    and every probe result bit for bit; retrained-centroid appends
    stay refused afterwards (VERDICT r8 next-round #1)."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        compact_trained_ivf_index,
        read_trained_ivf_manifest,
        write_trained_ivf_index,
    )

    _, x, _ = _blobs(n_blobs=4, per_blob=30, seed=41)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=4, max_iter=8)
    path = str(tmp_path / "tivf")
    write_trained_ivf_index(emb.where(F.col("vec_id") < 40), model, path)
    for lo, hi in ((40, 70), (70, 100), (100, 120)):
        batch = emb.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        write_trained_ivf_index(batch, model, path, append=True)

    probe = _corpus(spark, x[:6] + 0.01).withColumn(
        "vec_id", F.col("vec_id") + 5000
    )
    before_files = _count_data_files(path)
    before = _probe_snapshot(spark, path, probe)
    assert before, "planted near-copies must hit the index"

    n_before, n_after = compact_trained_ivf_index(spark, path)
    assert n_before == before_files and n_after < n_before

    spark.catalog.refreshByPath(path)
    assert _probe_snapshot(spark, path, probe) == before
    # manifest centroids preserved bit for bit; retrain still refused
    m2, vcol = read_trained_ivf_manifest(spark, path)
    assert vcol == "embedding"
    assert np.array_equal(m2.centroids, model.centroids)
    retrained = KMeansModel(model.centroids + 0.25, 1, 0.0, 0.0)
    with pytest.raises(ValueError, match="different centroids"):
        write_trained_ivf_index(probe, retrained, path, append=True)
    # cell partitioning preserved: every row still under its cell dir
    on_disk = spark.read.parquet(path)
    want = {
        r.vec_id: r.cell
        for r in assign_trained_cells(emb.where(F.col("vec_id") < 120),
                                      model).select("vec_id", "cell")
        .collect()
    }
    got = {r.vec_id: r.cell
           for r in on_disk.select("vec_id", "cell").collect()}
    assert got == want


def test_compact_trained_index_crash_drills(spark, tmp_path):
    """Every crash window leaves a state the next compaction/probe
    self-heals from — the fswap drill set applied to the trained
    index (mirrors tests/test_fswap.py)."""
    import os
    import shutil

    from web3_flight_rpc_server_spark.operators.fswap import (
        OLD_SUFFIX,
        TMP_SUFFIX,
    )
    from web3_flight_rpc_server_spark.operators.kmeans import (
        compact_trained_ivf_index,
        write_trained_ivf_index,
    )

    _, x, _ = _blobs(n_blobs=3, per_blob=20, seed=43)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=3, max_iter=6)
    path = str(tmp_path / "tivf")
    write_trained_ivf_index(emb.where(F.col("vec_id") < 30), model, path)
    write_trained_ivf_index(
        emb.where(F.col("vec_id") >= 30), model, path, append=True
    )
    probe = _corpus(spark, x[:4] + 0.01).withColumn(
        "vec_id", F.col("vec_id") + 5000
    )
    want = _probe_snapshot(spark, path, probe)
    assert want

    # crash BEFORE the swap started (complete tmp written, promote
    # never ran): compaction recovers (discards stale tmp), re-runs
    shutil.copytree(path, path + TMP_SUFFIX)
    compact_trained_ivf_index(spark, path)
    spark.catalog.refreshByPath(path)
    assert _probe_snapshot(spark, path, probe) == want
    assert not os.path.exists(path + TMP_SUFFIX)

    # crash BETWEEN swap steps 1 and 2 (live renamed aside, complete
    # tmp): the next PROBE self-heals forward in-line
    shutil.copytree(path, path + TMP_SUFFIX)
    os.rename(path, path + OLD_SUFFIX)
    spark.catalog.refreshByPath(path)
    assert _probe_snapshot(spark, path, probe) == want
    assert os.path.exists(path)
    assert not os.path.exists(path + OLD_SUFFIX)

    # crash MID-TMP-WRITE (no root _SUCCESS in tmp, live intact):
    # compaction discards the junk and proceeds
    shutil.copytree(path, path + TMP_SUFFIX)
    os.remove(os.path.join(path + TMP_SUFFIX, "_SUCCESS"))
    compact_trained_ivf_index(spark, path)
    spark.catalog.refreshByPath(path)
    assert _probe_snapshot(spark, path, probe) == want

    # appends recover a stranded index before writing (the fswap
    # contract: never recreate a missing live over .old history)
    os.rename(path, path + OLD_SUFFIX)
    extra = _corpus(spark, x[:2] + 3.0).withColumn(
        "vec_id", F.col("vec_id") + 9000
    )
    write_trained_ivf_index(extra, model, path, append=True)
    spark.catalog.refreshByPath(path)
    assert not os.path.exists(path + OLD_SUFFIX)
    ids = {r.vec_id for r in spark.read.parquet(path)
           .select("vec_id").collect()}
    assert {9000, 9001} <= ids and 0 in ids, "history + append both live"


def test_compact_empty_trained_index_is_noop(spark, tmp_path):
    from web3_flight_rpc_server_spark.operators.kmeans import (
        compact_trained_ivf_index,
        write_trained_ivf_index,
    )

    _, x, _ = _blobs(n_blobs=2, per_blob=10, seed=47)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=2, max_iter=4)
    path = str(tmp_path / "tivf")
    write_trained_ivf_index(emb.limit(0), model, path)
    assert compact_trained_ivf_index(spark, path) == (0, 0)


def test_ingest_then_compact_replay_still_rejected(spark, tmp_path):
    """The incremental semantic loop's replay contract survives
    compaction: ingest two batches, compact, replay batch 2 — every
    replayed vector meets its first copy at cosine 1.0 and is
    rejected, and the index row set is unchanged."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        compact_trained_ivf_index,
        write_trained_ivf_index,
    )
    from web3_flight_rpc_server_spark.operators.semdedup import (
        ingest_embeddings,
    )

    _, x, _ = _blobs(n_blobs=3, per_blob=20, seed=53)
    emb = _corpus(spark, x)
    model = kmeans_fit(emb, k=3, max_iter=6)
    path = str(tmp_path / "tivf")
    write_trained_ivf_index(emb.limit(0), model, path)

    b1 = emb.where(F.col("vec_id") < 30)
    b2 = emb.where((F.col("vec_id") >= 30) & (F.col("vec_id") < 45))
    ingest_embeddings(b1, path, threshold=0.95)
    admitted2, _ = ingest_embeddings(b2, path, threshold=0.95)
    n_admitted2 = admitted2.count()
    spark.catalog.refreshByPath(path)
    rows_before = {
        r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()
    }

    compact_trained_ivf_index(spark, path)
    spark.catalog.refreshByPath(path)

    readmitted, dups = ingest_embeddings(b2, path, threshold=0.95)
    assert readmitted.count() == 0, "replayed batch must be rejected"
    assert n_admitted2 > 0
    hit_cos = {r.cos for r in dups.collect()}
    assert 1.0 in hit_cos, "replays meet their first copies at cos 1.0"
    spark.catalog.refreshByPath(path)
    rows_after = {
        r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()
    }
    assert rows_after == rows_before


def test_duplicate_heavy_corpus_keeps_all_centroids_alive(spark):
    """Exact-duplicate rows (the norm on dedup corpora — benchdata
    plants 10x copies) must not seed duplicate centroids: identical
    seeds tie every assignment to the lower index and the twin stays
    dead forever (the r8 BASELINE collapse). Init samples DISTINCT
    vectors, so all k cells stay live on a 10x-duplicated corpus, for
    both init methods."""
    _, base, _ = _blobs(n_blobs=4, per_blob=5, seed=23)
    dup = np.repeat(base, 10, axis=0)  # 200 rows, 20 distinct
    emb = _corpus(spark, dup)
    for method in ("hash", "pp"):
        model = kmeans_fit(emb, k=4, max_iter=6, init_method=method)
        cents = {tuple(np.round(c, 9)) for c in model.centroids}
        assert len(cents) == 4, f"{method}: duplicate/dead centroids"
        cells = assign_trained_cells(emb, model).select("cell")
        pops = {r.cell for r in cells.distinct().collect()}
        assert pops == {0, 1, 2, 3}, f"{method}: dead cell ({pops})"


def test_init_scan_is_bounded_and_partitioning_invariant(spark):
    """Seed selection must not exchange the full corpus (VERDICT r8):
    on a corpus large enough to trip the hash pre-filter, the
    pre-distinct seed scan keeps a sliver of the rows, and the fitted
    centroids are IDENTICAL across arbitrary repartitionings (the
    predicate hashes the vector value, not the row position)."""
    from web3_flight_rpc_server_spark.operators.kmeans import _seed_scan

    rng = np.random.default_rng(31)
    n = 12000
    x = rng.normal(size=(n, DIM))
    emb = _corpus(spark, x)

    filtered, d = _seed_scan(emb, need=4, vec_col="embedding")
    assert d > 1, "fixture must be large enough to engage the filter"
    n_pool = filtered.count()
    # the exchange input is the sampled sliver, not the corpus
    assert n_pool < n / (d / 2), (n_pool, d)
    assert n_pool >= 4, "pool must still hold enough seeds"
    # the filter itself must be in the pool's plan (pushed into the
    # scan side, before any exchange)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan and "xxhash64" in plan, plan

    m_a = kmeans_fit(emb.repartition(13), k=4, max_iter=3, tol=0.0)
    m_b = kmeans_fit(emb.repartition(3), k=4, max_iter=3, tol=0.0)
    assert np.array_equal(m_a.centroids, m_b.centroids)
    m_pp_a = kmeans_fit(emb.repartition(7), k=4, max_iter=2, tol=0.0,
                        init_method="pp")
    m_pp_b = kmeans_fit(emb.repartition(2), k=4, max_iter=2, tol=0.0,
                        init_method="pp")
    assert np.array_equal(m_pp_a.centroids, m_pp_b.centroids)


def test_init_filter_skipped_on_small_corpus(spark):
    """Small corpora (approx distinct count below need x oversample)
    must behave exactly as before the filter existed: d == 1, no
    predicate, k distinct smallest-hash seeds."""
    from web3_flight_rpc_server_spark.operators.kmeans import _seed_scan

    _, x, _ = _blobs(n_blobs=2, per_blob=10, seed=37)
    emb = _corpus(spark, x)
    _, d = _seed_scan(emb, need=4, vec_col="embedding")
    assert d == 1


def test_pp_init_is_deterministic(spark):
    """Two pp fits on the same corpus produce identical centroids
    (fixed-seed D^2 selection over the hash-ordered sample)."""
    _, x, _ = _blobs(n_blobs=3, per_blob=20, seed=29)
    emb = _corpus(spark, x)
    m1 = kmeans_fit(emb, k=6, max_iter=3, init_method="pp")
    m2 = kmeans_fit(emb, k=6, max_iter=3, init_method="pp")
    assert np.allclose(m1.centroids, m2.centroids, atol=1e-12)
    with pytest.raises(ValueError, match="init_method"):
        kmeans_fit(emb, k=2, init_method="nope")
