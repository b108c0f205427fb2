"""Product quantization ANN tier (operators/pq.py): trained codebooks
reconstruct, encoding is deterministic, ADC scoring is JVM-side, and
measured recall@10 vs exact cosine clears a floor on the embeddings
fixture — the same measured-recall discipline as the IVF and LSH
tiers (tests/test_ann_recall.py, tests/test_lsh_recall.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)
from web3_flight_rpc_server_spark.sources import tables

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def trained(spark, emb):
    books = pq_train(emb, sample=1024)
    codes = pq_encode(emb, books).localCheckpoint(eager=True)
    return books, codes


def test_train_shapes_and_determinism(spark, emb):
    b1 = pq_train(emb, sample=512, k=16)
    b2 = pq_train(emb, sample=512, k=16)
    assert b1.shape == (16, 16, 4)
    assert np.array_equal(b1, b2), "same corpus+seed must retrain identically"
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)


def test_encode_is_complete_and_in_range(spark, emb, trained):
    books, codes = trained
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == 16
        assert all(0 <= c < 64 for c in r.codes)


def test_quantization_reconstruction_beats_random(spark, emb, trained):
    """The codebooks must actually fit the data: mean reconstruction
    error of the trained assignment far below random-code assignment."""
    books, codes = trained
    vecs = {r.vec_id: np.array(r.embedding)
            for r in emb.select("vec_id", "embedding").collect()}
    cmap = {r.vec_id: r.codes for r in codes.collect()}
    rng = np.random.default_rng(0)

    def recon_err(code_fn):
        errs = []
        for vid, v in vecs.items():
            rec = np.concatenate([books[j][code_fn(vid, j)]
                                  for j in range(16)])
            errs.append(((v - rec) ** 2).sum())
        return float(np.mean(errs))

    trained_err = recon_err(lambda vid, j: cmap[vid][j])
    random_err = recon_err(lambda vid, j: rng.integers(0, 64))
    assert trained_err < random_err / 3


def test_recall_floor_vs_exact_cosine(spark, emb, trained):
    """recall@10 of ADC top-10 vs exact inner-product top-10, averaged
    over 20 query vectors, on the HARD near-isotropic fixture (the
    module doc records the measured config table). Floor 0.5 for the
    default m16/k64 config (measured 0.63)."""
    books, codes = trained
    vecs = {r.vec_id: np.array(r.embedding)
            for r in emb.select("vec_id", "embedding").collect()}
    ids = sorted(vecs)
    hits = total = 0
    for qid in ids[:20]:
        q = vecs[qid]
        exact = sorted(
            (vid for vid in ids if vid != qid),
            key=lambda v: (-float(np.dot(vecs[v], q)), v),
        )[:10]
        got = [r.vec_id for r in
               pq_topk(codes.where(F.col("vec_id") != qid),
                       q, books).collect()]
        hits += len(set(exact) & set(got))
        total += 10
    recall = hits / total
    assert recall >= 0.5, f"PQ recall@10 collapsed: {recall:.2f}"


def test_adc_plan_is_jvm_side(spark, emb, trained):
    """Scoring must not leave the JVM: no Python-eval nodes in the
    top-k plan (the only Python stage in the whole tier is the encode
    mapInPandas, which runs once at index-build time)."""
    books, codes = trained
    q = np.ones(64)
    plan = pq_topk(codes, q, books) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan  # codes were materialized upstream
    assert "TakeOrdered" in plan


def test_rerank_recovers_exact_topk(spark, emb, trained):
    """The exact re-rank stage: ADC shortlist of 100 (of 500) then
    true inner-product scoring must recover nearly the exact top-10 —
    recall@10 >= 0.9 averaged over 20 queries — and return EXACT
    scores for what it ranks."""
    from web3_flight_rpc_server_spark.operators.pq import pq_topk_rerank

    books, codes = trained
    vecs = {r.vec_id: np.array(r.embedding)
            for r in emb.select("vec_id", "embedding").collect()}
    ids = sorted(vecs)
    hits = total = 0
    for qid in ids[:20]:
        q = vecs[qid]
        exact = sorted(
            (vid for vid in ids if vid != qid),
            key=lambda v: (-float(np.dot(vecs[v], q)), v),
        )[:10]
        got = pq_topk_rerank(
            codes.where(F.col("vec_id") != qid),
            emb.where(F.col("vec_id") != qid), q, books,
        ).collect()
        for r in got:  # exact scores, not ADC approximations
            assert abs(r.score - float(np.dot(vecs[r.vec_id], q))) < 1e-6
        hits += len(set(exact) & {r.vec_id for r in got})
        total += 10
    recall = hits / total
    assert recall >= 0.9, f"re-rank recall@10: {recall:.2f}"


def test_ivf_pq_composed_index(spark, emb, trained, tmp_path):
    """IVF + PQ at rest: cell-partitioned codes prune at plan time
    (PartitionFilters), full probe degrades exactly to global ADC,
    and a partial probe equals ADC restricted to the probed cells."""
    from web3_flight_rpc_server_spark.operators.ivf import (
        assign_cells,
        probe_cells_for,
    )
    from web3_flight_rpc_server_spark.operators.pq import (
        ivf_pq_topk,
        read_pq_codebooks,
        write_ivf_pq_index,
    )

    books, codes = trained
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(emb, path, books, n_cells=8)
    assert np.array_equal(read_pq_codebooks(spark, path), books)

    q = np.array(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    # full probe == global ADC over all codes
    full = [(r.vec_id, round(r.score, 9)) for r in
            ivf_pq_topk(spark, path, q, k=10, n_probe=8).collect()]
    global_ = [(r.vec_id, round(r.score, 9)) for r in
               pq_topk(codes, q, books, k=10).collect()]
    assert full == global_
    # partial probe == ADC restricted to the probed cells
    cells = probe_cells_for(q, 8, 3)
    member_ids = {
        r.vec_id for r in assign_cells(emb, 8).where(
            F.col("cell").isin(cells)).select("vec_id").collect()
    }
    restricted = [(r.vec_id, round(r.score, 9)) for r in pq_topk(
        codes.join(
            spark.createDataFrame([(i,) for i in member_ids],
                                  "vec_id long"),
            "vec_id", "left_semi"),
        q, books, k=10).collect()]
    partial = [(r.vec_id, round(r.score, 9)) for r in
               ivf_pq_topk(spark, path, q, k=10, n_probe=3).collect()]
    assert partial == restricted
    # the scan prunes: partition filter on cell in the plan
    plan = ivf_pq_topk(spark, path, q, k=10, n_probe=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan


def test_trained_ivf_pq_composed_index(spark, emb, trained, tmp_path):
    """TRAINED IVF + PQ at rest: trained-cell-partitioned codes prune
    at plan time, full probe degrades exactly to global ADC, partial
    probe equals ADC restricted to the trained probe cells, the exact
    re-rank stage works against the raw table, appends land under the
    manifests' models, and BOTH refusal contracts hold (retrained
    centroids / retrained codebooks)."""
    from web3_flight_rpc_server_spark.operators.kmeans import (
        KMeansModel,
        assign_trained_cells,
        kmeans_fit,
        trained_probe_cells,
    )
    from web3_flight_rpc_server_spark.operators.pq import (
        compact_trained_ivf_pq_index,
        read_pq_codebooks,
        trained_ivf_pq_topk,
        write_trained_ivf_pq_index,
    )
    from web3_flight_rpc_server_spark.operators.similarity import dot_fixed

    books, codes = trained
    base = emb.where(F.col("vec_id") < 400)
    model = kmeans_fit(base, k=6, max_iter=6, init_method="pp")
    path = str(tmp_path / "tivfpq")
    write_trained_ivf_pq_index(base, model, path, books)
    assert np.array_equal(read_pq_codebooks(spark, path), books)

    base_codes = codes.join(base.select("vec_id"), "vec_id", "left_semi")
    q = np.array(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    full = [(r.vec_id, round(r.score, 9)) for r in
            trained_ivf_pq_topk(spark, path, q, k=10,
                                n_probe=model.k).collect()]
    global_ = [(r.vec_id, round(r.score, 9)) for r in
               pq_topk(base_codes, q, books, k=10).collect()]
    assert full == global_

    cells = trained_probe_cells(q, model, 2)
    member_ids = {
        r.vec_id for r in assign_trained_cells(base, model).where(
            F.col("cell").isin(cells)).select("vec_id").collect()
    }
    restricted = [(r.vec_id, round(r.score, 9)) for r in pq_topk(
        base_codes.join(
            spark.createDataFrame([(i,) for i in member_ids],
                                  "vec_id long"),
            "vec_id", "left_semi"),
        q, books, k=10).collect()]
    partial = [(r.vec_id, round(r.score, 9)) for r in
               trained_ivf_pq_topk(spark, path, q, k=10,
                                   n_probe=2).collect()]
    assert partial == restricted
    plan = trained_ivf_pq_topk(spark, path, q, k=10, n_probe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan

    # re-rank: exact scores of the ADC shortlist's top-k (inner
    # product expression == the exact fold over the raw table)
    rer = trained_ivf_pq_topk(spark, path, q, k=5, n_probe=model.k,
                              rerank_with=base, shortlist=50)
    got = [(r.vec_id, round(r.score, 9)) for r in rer.collect()]
    qlit = F.array(*[F.lit(float(v)) for v in q])
    exact = {
        r.vec_id: round(r.score, 9)
        for r in base.select(
            "vec_id",
            dot_fixed(F.col("embedding"), qlit, 64).alias("score"),
        ).collect()
    }
    assert all(exact[i] == s for i, s in got)
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))

    # append under the manifests' models; replays of the composed
    # probe see the appended codes
    extra = emb.where(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 450)
    )
    write_trained_ivf_pq_index(extra, model, path, books, append=True)
    spark.catalog.refreshByPath(path.rstrip("/") + "/codes")
    on_disk = spark.read.parquet(path.rstrip("/") + "/codes")
    assert on_disk.count() == 450
    want_cells = {
        r.vec_id: r.cell
        for r in assign_trained_cells(extra, model)
        .select("vec_id", "cell").collect()
    }
    got_cells = {
        r.vec_id: r.cell
        for r in on_disk.where(F.col("vec_id") >= 400)
        .select("vec_id", "cell").collect()
    }
    assert got_cells == want_cells

    # compaction: probe bit-identical, file count drops
    probe_before = [(r.vec_id, round(r.score, 9)) for r in
                    trained_ivf_pq_topk(spark, path, q, k=10,
                                        n_probe=2).collect()]
    n_before, n_after = compact_trained_ivf_pq_index(spark, path)
    assert n_after < n_before
    probe_after = [(r.vec_id, round(r.score, 9)) for r in
                   trained_ivf_pq_topk(spark, path, q, k=10,
                                       n_probe=2).collect()]
    assert probe_after == probe_before

    # refusals: retrained centroids, then retrained codebooks
    retrained = KMeansModel(model.centroids + 0.3, 1, 0.0, 0.0)
    with pytest.raises(ValueError, match="different centroids"):
        write_trained_ivf_pq_index(extra, retrained, path, books,
                                   append=True)
    with pytest.raises(ValueError, match="different PQ codebooks"):
        write_trained_ivf_pq_index(extra, model, path, books + 0.1,
                                   append=True)


def test_composed_index_rebuild_crash_drills(spark, emb, trained, tmp_path):
    """The composed index's whole-directory rebuild swap: a probe
    against an index stranded mid-swap self-heals in-line and returns
    bit-identical results; an interrupted rebuild (complete tmp,
    promote never ran) is finished or discarded safely by the next
    rebuild."""
    import os
    import shutil

    from web3_flight_rpc_server_spark.operators.fswap import (
        OLD_SUFFIX,
        TMP_SUFFIX,
    )
    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit
    from web3_flight_rpc_server_spark.operators.pq import (
        trained_ivf_pq_topk,
        write_trained_ivf_pq_index,
    )

    books, _codes = trained
    base = emb.where(F.col("vec_id") < 300)
    model = kmeans_fit(base, k=4, max_iter=5)
    path = str(tmp_path / "tivfpq")
    write_trained_ivf_pq_index(base, model, path, books)
    q = np.array(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )

    def snapshot():
        return [(r.vec_id, round(r.score, 9)) for r in
                trained_ivf_pq_topk(spark, path, q, k=10,
                                    n_probe=2).collect()]

    want = snapshot()
    assert want

    # crash BETWEEN swap steps 1 and 2 (live renamed aside, complete
    # tmp): the next probe's manifest read self-heals forward
    shutil.copytree(path, path + TMP_SUFFIX)
    os.rename(path, path + OLD_SUFFIX)
    spark.catalog.refreshByPath(path)
    assert snapshot() == want
    assert os.path.exists(path)
    assert not os.path.exists(path + OLD_SUFFIX)

    # rebuild over a stale half-written tmp (no root _SUCCESS):
    # discarded, rebuild lands, probe unchanged
    shutil.copytree(path, path + TMP_SUFFIX)
    # a straggler tmp from a crashed rebuild has no root _SUCCESS
    # (rebuild_directory stamps it only after every dataset is written)
    success = os.path.join(path + TMP_SUFFIX, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    write_trained_ivf_pq_index(base, model, path, books)
    spark.catalog.refreshByPath(path)
    assert snapshot() == want
    assert not os.path.exists(path + TMP_SUFFIX)


def test_codes_level_compaction_crash_drills(spark, emb, trained, tmp_path):
    """compact_trained_ivf_pq_index swaps codes/ DIRECTLY (the models
    live outside it), so a crash mid-compaction strands a SECOND swap
    level below the root rebuild's. Both reader and writer must heal
    it: probes self-heal the codes swap in-line (forward from a
    complete tmp, backward from a bare .old), and appends recover
    codes/ BEFORE writing — an append that recreated a missing codes/
    would let the next recovery see it live and delete codes.old,
    permanently losing the pre-compaction history (r9 ADVICE)."""
    import os
    import shutil

    from web3_flight_rpc_server_spark.operators.fswap import (
        OLD_SUFFIX,
        TMP_SUFFIX,
    )
    from web3_flight_rpc_server_spark.operators.kmeans import kmeans_fit
    from web3_flight_rpc_server_spark.operators.pq import (
        trained_ivf_pq_topk,
        write_trained_ivf_pq_index,
    )

    books, _codes = trained
    base = emb.where(F.col("vec_id") < 300)
    model = kmeans_fit(base, k=4, max_iter=5)
    path = str(tmp_path / "tivfpq")
    codes_dir = path + "/codes"
    write_trained_ivf_pq_index(base, model, path, books)
    q = np.array(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )

    def snapshot():
        spark.catalog.refreshByPath(codes_dir)
        return [(r.vec_id, round(r.score, 9)) for r in
                trained_ivf_pq_topk(spark, path, q, k=10,
                                    n_probe=2).collect()]

    want = snapshot()
    assert want

    # crash BETWEEN codes-swap steps 1 and 2 (codes renamed aside,
    # complete tmp): the probe's codes read self-heals FORWARD
    shutil.copytree(codes_dir, codes_dir + TMP_SUFFIX)
    os.rename(codes_dir, codes_dir + OLD_SUFFIX)
    assert snapshot() == want
    assert os.path.exists(codes_dir)
    assert not os.path.exists(codes_dir + OLD_SUFFIX)

    # crash BEFORE the tmp write finished (codes renamed aside, tmp
    # lacks _SUCCESS): the probe rolls BACK to the pre-compaction data
    shutil.copytree(codes_dir, codes_dir + TMP_SUFFIX)
    os.remove(os.path.join(codes_dir + TMP_SUFFIX, "_SUCCESS"))
    os.rename(codes_dir, codes_dir + OLD_SUFFIX)
    assert snapshot() == want
    assert os.path.exists(codes_dir)
    assert not os.path.exists(codes_dir + TMP_SUFFIX)

    # append over a stranded codes swap: the double recovery completes
    # the swap FIRST, so history and the new batch both survive (the
    # r9 ADVICE high scenario — without it the append recreates
    # codes/ with only the new batch and the next recovery deletes
    # codes.old, i.e. every pre-compaction code)
    shutil.copytree(codes_dir, codes_dir + TMP_SUFFIX)
    os.rename(codes_dir, codes_dir + OLD_SUFFIX)
    extra = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 340))
    write_trained_ivf_pq_index(extra, model, path, books, append=True)
    spark.catalog.refreshByPath(codes_dir)
    assert not os.path.exists(codes_dir + OLD_SUFFIX)
    assert not os.path.exists(codes_dir + TMP_SUFFIX)
    ids = {r.vec_id for r in spark.read.parquet(codes_dir)
           .select("vec_id").collect()}
    assert ids == set(range(340)), (
        "pre-compaction history and the appended batch must both live"
    )
