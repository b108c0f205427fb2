"""Winnowing and IVF-ANN verification against constructed truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.ivf import assign_cells, ivf_topk
from web3_flight_rpc_server_spark.operators.similarity import cosine_topk
from web3_flight_rpc_server_spark.operators.winnowing import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)
from web3_flight_rpc_server_spark.sources import tables


def test_winnow_deterministic_and_guarantee(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different sentence with other words here"),
            # shares a long substring with doc 1 -> guaranteed overlap
            (3, "prefix text then the quick brown fox jumps over something"),
            (4, "xy"),  # shorter than k -> empty fingerprint set
        ],
        "doc_id long, text string",
    )
    fp = {r.doc_id: set(r.fingerprints) for r in winnow_fingerprints(docs).collect()}
    fp2 = {r.doc_id: set(r.fingerprints) for r in winnow_fingerprints(docs).collect()}
    assert fp == fp2, "fingerprints must be deterministic"
    assert fp[4] == set()
    # winnowing guarantee: shared substring len >= w+k-1 (=8) shares >=1
    assert fp[1] & fp[3], "long shared substring must share a fingerprint"
    assert len(fp[1] & fp[2]) < len(fp[1] & fp[3])


def test_fingerprint_overlap_pairs_find_near_dups(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents")
    from web3_flight_rpc_server_spark.operators.dedup import ngram_jaccard_pairs

    truth = {(r.d1, r.d2) for r in ngram_jaccard_pairs(docs, 0.9).collect()}
    found = {
        (r.d1, r.d2)
        for r in fingerprint_overlap_pairs(docs, min_shared=5).collect()
    }
    missing = truth - found
    assert not missing, f"winnowing missed near-identical docs: {sorted(missing)[:5]}"


def test_ivf_cells_cover_and_are_deterministic(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    celled = assign_cells(emb, n_cells=8)
    cells = celled.groupBy("cell").count().collect()
    assert all(0 <= r.cell < 8 for r in cells)
    assert celled.where(F.col("cell").isNull()).count() == 0
    again = assign_cells(emb, n_cells=8).select("vec_id", "cell").collect()
    assert {(r.vec_id, r.cell) for r in again} == {
        (r.vec_id, r.cell)
        for r in celled.select("vec_id", "cell").collect()
    }


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0)
    corpus = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in cosine_topk(corpus, qvec, k=10).collect()]
    # full probe = exhaustive: must equal brute force exactly
    full = [
        r.vec_id
        for r in ivf_topk(corpus, qvec, k=10, n_cells=8, n_probe=8).collect()
    ]
    assert full == exact
    # partial probe: meaningful recall at a fraction of the scan
    part = {
        r.vec_id
        for r in ivf_topk(corpus, qvec, k=10, n_cells=8, n_probe=3).collect()
    }
    recall = len(part & set(exact)) / 10
    assert recall >= 0.3, f"ivf recall {recall}"


def test_ivf_partitioned_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """The cell-partitioned layout (write_ivf_index) is the 100 TB
    story: the probe list is a plan-time constant, so the scan prunes
    to n_probe directories (PartitionFilters) and never lists the
    rest. Full probe over the index must equal brute force."""
    from web3_flight_rpc_server_spark.operators.ivf import (
        ivf_topk_partitioned,
        probe_cells_for,
        write_ivf_index,
    )

    emb = tables.load_table(spark, sf_dir, "embeddings")
    qvec_row = emb.where(F.col("vec_id") == 0).collect()[0]
    corpus = emb.where(F.col("vec_id") != 0)
    idx_path = str(tmp_path / "ivf_index")
    write_ivf_index(corpus, idx_path, n_cells=8)

    # layout: one directory per cell
    import os

    dirs = sorted(d for d in os.listdir(idx_path) if d.startswith("cell="))
    assert dirs == [f"cell={i}" for i in range(8)]

    # full probe == exhaustive brute force
    exact = [
        r.vec_id
        for r in cosine_topk(corpus, emb.where(F.col("vec_id") == 0), k=10).collect()
    ]
    full = [
        r.vec_id
        for r in ivf_topk_partitioned(
            spark, idx_path, qvec_row.embedding, k=10, n_cells=8, n_probe=8
        ).collect()
    ]
    assert full == exact

    # partial probe reads ONLY the probed directories (partition pruning)
    probes = probe_cells_for(qvec_row.embedding, n_cells=8, n_probe=3)
    part_df = ivf_topk_partitioned(
        spark, idx_path, qvec_row.embedding, k=10, n_cells=8, n_probe=3
    )
    # (inputFiles() lists pre-pruning files, so assert on the plan: the
    # IN-filter must land in PartitionFilters, i.e. directory pruning)
    import re

    plan = part_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, f"no partition filter in plan:\n{plan}"
    assert sorted(map(int, m.group(1).split(","))) == sorted(probes)
    # and the pruned scan touches exactly the probe directories' rows
    scanned = spark.read.parquet(idx_path).where(F.col("cell").isin(probes))
    direct = spark.read.parquet(
        *[f"{idx_path}/cell={p}" for p in probes]
    )
    assert scanned.count() == direct.count()
    recall = len({r.vec_id for r in part_df.collect()} & set(exact)) / 10
    assert recall >= 0.3, f"partitioned ivf recall {recall}"


def test_declared_q_ivf_topk_is_the_partitioned_path(spark, sf_dir):
    """The driver-attested q_ivf_topk must BE the 100 TB plan: its
    scan reads the materialized cell-partitioned index with the probe
    list as a plan-time PartitionFilter — not the in-situ variant that
    scans the full corpus and assigns cells at read time."""
    import re

    from web3_flight_rpc_server_spark.registry import all_queries

    df = all_queries()["q_ivf_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, f"no partition filter in declared q_ivf_topk plan:\n{plan}"
    assert len(m.group(1).split(",")) == 3  # n_probe of 8 cells


def test_ivf_topk_rejects_empty_and_multirow_query(spark, sf_dir):
    """The eager single-row collect in ivf_topk must fail loudly, not
    with a TypeError on an empty query or by silently picking an
    arbitrary row from a multi-row one."""
    import pytest

    from web3_flight_rpc_server_spark.sources import tables

    emb = tables.load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="single-row"):
        ivf_topk(emb, emb.where(F.col("vec_id") < 0), n_cells=8)
    with pytest.raises(ValueError, match="single-row"):
        ivf_topk(emb, emb.where(F.col("vec_id") < 2), n_cells=8)


def test_winnow_md5_tier_guarantee_and_determinism(spark):
    """The declared q_winnow_overlap uses the md5-bridge hash; the
    winnowing guarantee (shared substring >= w+k-1 chars shares >= 1
    fingerprint) and determinism must hold for that tier too."""
    from web3_flight_rpc_server_spark.functions import md5_prefix60

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different sentence with other words here"),
            (3, "prefix text then the quick brown fox jumps over something"),
            (4, "xy"),
        ],
        "doc_id long, text string",
    )
    fp = {
        r.doc_id: set(r.fingerprints)
        for r in winnow_fingerprints(docs, hash_fn=md5_prefix60).collect()
    }
    fp2 = {
        r.doc_id: set(r.fingerprints)
        for r in winnow_fingerprints(docs, hash_fn=md5_prefix60).collect()
    }
    assert fp == fp2
    assert fp[4] == set()
    assert fp[1] & fp[3], "long shared substring must share a fingerprint"
    assert all(0 <= h < 2 ** 60 for hs in fp.values() for h in hs)


def test_ivf_append_matches_one_shot_and_pins_layout(spark, sf_dir, tmp_path):
    """Incremental IVF ingestion: appending a second batch must land
    every vector in the cell the one-shot build assigns (assignment is
    a pure function of vector + manifest layout), so queries over the
    appended index equal queries over a one-shot index of the union.
    Mismatched layouts are refused at append AND at probe time."""
    import pytest

    from web3_flight_rpc_server_spark.operators.ivf import (
        ivf_topk_partitioned,
        write_ivf_index,
    )

    emb = tables.load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    first = corpus.where(F.col("vec_id") % 2 == 0)
    second = corpus.where(F.col("vec_id") % 2 == 1)
    qvec = emb.where(F.col("vec_id") == 0).collect()[0].embedding

    inc_path = str(tmp_path / "ivf_inc")
    one_path = str(tmp_path / "ivf_one")
    write_ivf_index(first, inc_path, n_cells=8)
    write_ivf_index(second, inc_path, n_cells=8, append=True)
    write_ivf_index(corpus, one_path, n_cells=8)

    inc = [
        (r.vec_id, round(r.cos, 6))
        for r in ivf_topk_partitioned(
            spark, inc_path, qvec, k=10, n_cells=8, n_probe=3
        ).collect()
    ]
    one = [
        (r.vec_id, round(r.cos, 6))
        for r in ivf_topk_partitioned(
            spark, one_path, qvec, k=10, n_cells=8, n_probe=3
        ).collect()
    ]
    assert inc == one and inc

    with pytest.raises(ValueError, match="rebuild"):
        write_ivf_index(second, inc_path, n_cells=16, append=True)
    with pytest.raises(ValueError, match="wrong cells"):
        ivf_topk_partitioned(spark, inc_path, qvec, k=10, n_cells=16)


def test_ivf_index_rebuild_crash_drills(spark, tmp_path):
    """write_ivf_index rebuilds are the whole-directory atomic swap
    since r9 (the r8-advisor-flagged gap): a probe against an index
    stranded mid-swap self-heals in-line with bit-identical results,
    and a crash between the manifest and data writes leaves a tmp the
    promote refuses (no root _SUCCESS), never a manifestless live."""
    import os
    import shutil

    import numpy as np

    from web3_flight_rpc_server_spark.operators.fswap import (
        OLD_SUFFIX,
        TMP_SUFFIX,
    )
    from web3_flight_rpc_server_spark.operators.ivf import (
        ivf_topk_partitioned,
        read_ivf_manifest,
        write_ivf_index,
    )

    rng = np.random.default_rng(67)
    x = rng.normal(size=(200, 16))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_cells=4, dim=16)

    def snapshot():
        return [
            (r.vec_id, round(r.cos, 9))
            for r in ivf_topk_partitioned(
                spark, path, [float(v) for v in x[0]],
                k=5, n_cells=4, n_probe=2, dim=16,
            ).collect()
        ]

    want = snapshot()
    assert want

    # strand mid-swap: live renamed aside, complete tmp beside it
    shutil.copytree(path, path + TMP_SUFFIX)
    os.rename(path, path + OLD_SUFFIX)
    spark.catalog.refreshByPath(path)
    assert read_ivf_manifest(spark, path) == (4, 16, "embedding")
    assert snapshot() == want
    assert not os.path.exists(path + OLD_SUFFIX)

    # rebuild discards a stale no-_SUCCESS tmp and lands cleanly
    shutil.copytree(path, path + TMP_SUFFIX)
    os.remove(os.path.join(path + TMP_SUFFIX, "_SUCCESS"))
    write_ivf_index(emb, path, n_cells=4, dim=16)
    spark.catalog.refreshByPath(path)
    assert snapshot() == want
    assert not os.path.exists(path + TMP_SUFFIX)

    # appends recover a stranded index before writing
    os.rename(path, path + OLD_SUFFIX)
    extra = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 9000)
    write_ivf_index(extra, path, n_cells=4, dim=16, append=True)
    spark.catalog.refreshByPath(path)
    ids = {r.vec_id for r in
           spark.read.parquet(path).select("vec_id").collect()}
    assert {9000, 9001, 9002} <= ids and 0 in ids
    assert not os.path.exists(path + OLD_SUFFIX)
