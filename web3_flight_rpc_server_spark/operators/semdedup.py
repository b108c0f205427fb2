"""SemDeDup-style SEMANTIC near-dup over embedding columns (C12 x C10:
the embedding analog of the fingerprint dedup tiers).

Exact all-pairs cosine is quadratic (operators/similarity.py:
neardup_pairs_bruteforce is the fenced ground truth). The scale shape
here is the SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
cluster the corpus, then look for near-duplicates ONLY within a
cluster — pairs straddling a cluster boundary are deliberately
sacrificed, turning O(n^2) into O(sum of cluster^2) ~ O(n^2/K).

This implementation reuses the IVF machinery instead of training
k-means: every vector is assigned to its ``top_m`` nearest of K
DETERMINISTIC literal anchors (operators/ivf.py — the same anchors,
products and fold order the partitioned ANN index uses, so a DuckDB
oracle can replicate the blocking bit for bit). ``top_m > 1`` is the
standard multi-assignment recall lever: a pair collides when the two
vectors' top-m cell sets intersect, which catches most boundary
stragglers at m^2/K of the all-pairs cost. Candidates are then
exact-verified with the codegen'd fixed-dimension cosine — the tier
never emits a false positive, only misses.

Recall regimes (measured in tests/test_semdedup.py): at a true
near-dup threshold (cosine >= ~0.9, the SemDeDup operating point)
near-identical vectors land in the same argmax cell almost surely and
recall is ~1; at loose thresholds (>= 0.3 on an isotropic corpus)
within-cell recall is the documented ~0.5-0.7 — that regime is what
the brute-force tier is for.

Cell-size cap: K is the CAPACITY parameter — size it so n/K fits the
within-cell join budget (the 100 TB deployment picks K ~ n/1000, same
economics as the paper). Because a cell's expected population is n/K
by construction, this tier intentionally does NOT default to the
fingerprint tiers' DEFAULT_MAX_BUCKET hot-bucket cap (a 5000-row cap
with undersized K would quarantine every cell): ``max_cell=None`` by
default, and an explicit ``max_cell`` enables the same
exclude-and-ledger quarantine contract as the fingerprint tiers for
genuinely skewed corpora (one templated/degenerate direction
swallowing a cell).

Reference parity: the reference has no vector surface at all; this is
north-star C12 scope (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.localdf import local_df


def top_cells(vec_col: Column, n_cells: int = 8, dim: int = 64,
              top_m: int = 2, centroids=None) -> Column:
    """Array of the ``top_m`` nearest-anchor cell ids, ordered by
    score desc with smallest-index tie-break — element 1 equals
    operators/ivf.py:cell_of exactly (same struct-max contract), so
    ``top_m=1`` blocking is precisely the IVF cell assignment.

    ``centroids`` (a KMeansModel from operators/kmeans.py) swaps the
    untrained pseudo-random anchors for TRAINED centroids: scoring
    becomes negated euclidean distance (trained_cell_scores), element
    1 == assign_trained_cells' cell, and ``n_cells`` is taken from the
    model. Trained blocking is the paper-faithful SemDeDup — real
    clusters land whole in one cell (recall gain measured in
    tests/test_kmeans.py); untrained stays the default because the
    DuckDB oracle can replicate it bit for bit."""
    if centroids is not None:
        from .kmeans import trained_cell_scores

        n_cells = centroids.k
        scores = trained_cell_scores(vec_col, centroids)
    else:
        from .ivf import _anchors, _dot_literal

        anchors = _anchors(n_cells, dim)
        scores = F.array(*[_dot_literal(vec_col, a) for a in anchors])
    # sort (score asc, -i asc) = (score asc, i desc); the last m
    # reversed are (score desc, i asc) — ties pick the smaller cell,
    # matching cell_of's array_max struct pick.
    ranked = F.array_sort(
        F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda v, i: F.struct(v.alias("v"), (-i).alias("ni")),
        )
    )
    return F.transform(
        F.reverse(F.slice(ranked, -top_m, top_m)),
        lambda s: (-s["ni"]).cast("int"),
    )


def assign_top_cells(embeddings: DataFrame, n_cells: int = 8,
                     dim: int = 64, top_m: int = 2,
                     vec_col: str = "embedding",
                     centroids=None) -> DataFrame:
    """One row per (vector, assigned cell) — ``top_m`` rows per
    vector, all input columns preserved. Arrow/numpy execution: the
    K x dim literal-expression assignment is correct but janino
    chokes on the generated method (multi-second compile attempts,
    then interpreted fallback — measured ~8 s for a 2k-row corpus at
    K=8, dim=64), while the numpy twin computes the SAME fold in
    milliseconds and BIT FOR BIT: the score fold accumulates one
    dimension at a time in float64 (``acc = acc + x_i * a_i`` — the
    exact left-fold order of operators/ivf.py:_dot_literal,
    vectorized over rows instead of unrolled over dims), the trained
    bias subtracts once at the end exactly like trained_cell_scores,
    and the ranking is a stable argsort of the negated scores —
    (score desc, index asc), the expression form's tie-break.
    Identical IEEE operations in the same order means the numpy
    cells, the expression cells (top_cells — kept as the plan-side
    form and the cross-engine arithmetic contract), and the DuckDB
    oracle's cells agree exactly (pinned in tests/test_semdedup.py).
    """
    import numpy as np

    if centroids is not None:
        anchors = centroids.centroids
        bias = (anchors * anchors).sum(axis=1) / 2.0
    else:
        from .ivf import _anchors

        anchors = _anchors(n_cells, dim)
        bias = None

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(embeddings.schema.fields)
        + [StructField("cell", IntegerType(), False)]
    )
    m = top_m
    # plain ndarrays captured BY VALUE in the closure: the worker-side
    # function must not reference this package (cloudpickle serializes
    # nested functions by value, but module-level helpers by module
    # reference, and the driver contract runs from a foreign cwd where
    # executors cannot import the package) — same rule as the SYNM
    # decode paths
    anchors_v = np.asarray(anchors, dtype=np.float64)
    bias_v = None if bias is None else np.asarray(bias, dtype=np.float64)

    def assign(batches):
        import numpy as _np

        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            scores = _np.empty((len(x), len(anchors_v)), dtype=_np.float64)
            for j in range(len(anchors_v)):
                acc = _np.zeros(len(x), dtype=_np.float64)
                a = anchors_v[j]
                for i in range(len(a)):
                    acc = acc + x[:, i] * float(a[i])
                scores[:, j] = acc if bias_v is None else acc - bias_v[j]
            top = _np.argsort(-scores, axis=1, kind="stable")[:, :m]
            idx = _np.repeat(_np.arange(len(pdf)), m)
            out = pdf.iloc[idx].copy()
            out["cell"] = top.ravel().astype(_np.int32)
            yield out

    return embeddings.mapInPandas(assign, out_schema)


def semantic_neardup_pairs(embeddings: DataFrame, threshold: float,
                           n_cells: int = 8, dim: int = 64,
                           top_m: int = 2,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           max_cell: int | None = None,
                           with_quarantine: bool = False,
                           centroids=None):
    """(d1, d2, cos) pairs with cosine >= ``threshold`` whose top-m
    cell sets intersect (d1 < d2, one row per pair).

    Execution is the textbook SemDeDup shape, propose-then-confirm,
    both inside ONE per-cell ``applyInPandas`` stage:

    - PROPOSE: each cell's within-cell pairwise similarity is ONE
      numpy gallery matmul (X @ X.T in BLAS) and only pairs above
      ``threshold - 1e-9`` survive. The epsilon covers BLAS-vs-fold
      summation differences (~1e-15 relative), so no fold-qualifying
      pair is ever missed. A cell is a single matmul task — O((n/K)^2)
      FLOPs in BLAS, never a row-at-a-time join.
    - CONFIRM: the surviving pairs (output-sized) are re-scored with
      the EXACT FOLD ARITHMETIC — per-dimension sequential float64
      accumulation for the dot and both norms, vectorized over pairs —
      which is bit-identical to the cosine_fixed expression fold, so
      emitted values and the >= threshold decision match a naive
      fold-verified join exactly and the DuckDB oracle hash-parity
      holds. (A codegen-expression confirm was tried first: the
      dim-term fold in one generated method exceeds the JVM's ~8 KB
      JIT limit and runs bytecode-interpreted — 24 s for 1M candidates
      at sf0.1 — and janino burns multi-second compile attempts per
      query even on the output-sized confirm join.)

    Precision is 1 by construction (exact confirm); only boundary
    pairs are missed. ``max_cell`` (opt-in — see module docstring for
    why this tier's default differs from the fingerprint tiers')
    excludes cells whose population exceeds it BEFORE the matmul and,
    with ``with_quarantine=True``, returns ``(pairs, ledger)`` where
    ledger is the excluded (cell, n_vectors) set — recall loss
    reported, not hidden, same contract as fingerprint_pairs."""
    celled = assign_top_cells(
        embeddings.select(id_col, vec_col),
        n_cells, dim, top_m, vec_col, centroids,
    )
    quarantine = None
    if max_cell is not None:
        # registered in dedup.py's cache ledger (not a bare persist):
        # long-lived hosts release via operators.dedup.release_caches()
        # after the consuming action, same convention as every other
        # persisted intermediate in the dedup family (r8 ADVICE)
        from .dedup import _persisted

        celled = _persisted(celled)
        pops = celled.groupBy("cell").agg(
            F.count("*").alias("n_vectors")
        )
        quarantine = pops.where(F.col("n_vectors") > max_cell)
        celled = celled.join(
            F.broadcast(quarantine.select("cell")), "cell", "left_anti"
        )

    eps_threshold = threshold - 1e-9
    thr = threshold
    d = dim
    id_name, vec_name = id_col, vec_col
    id_dt = embeddings.schema[id_col].dataType.simpleString()

    def propose_confirm(pdf):
        import numpy as _np
        import pandas as _pd

        n = len(pdf)
        if n < 2:
            return _pd.DataFrame({"d1": [], "d2": [], "cos": []})
        x = _np.stack(
            [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_name]]
        )
        nrm = _np.linalg.norm(x, axis=1)
        # propose in ROW x COLUMN TILES: the full n x n float64
        # similarity matrix is ~20 GB for a 50k-row cell — the sf10
        # headline run OOM-killed the Python worker here (r10). A
        # row-only tile grows linearly again past ~131k rows (a
        # 256-row floor x 1M columns is still a 2 GB block), so BOTH
        # dims are tiled: each BLAS block is at most TILE x TILE
        # float64 = 134 MB regardless of cell size. Column blocks
        # entirely below the diagonal are skipped (j > i is required
        # anyway). Tiling only moves BLAS call boundaries, and the
        # 1e-9 propose margin absorbs accumulation-order differences
        # while the exact confirm makes the decision, so emitted
        # pairs stay bit-identical.
        TILE = 4096
        cand_i, cand_j = [], []
        for lo in range(0, n, TILE):
            hi = min(lo + TILE, n)
            for clo in range((lo // TILE) * TILE, n, TILE):
                chi = min(clo + TILE, n)
                s_blk = (
                    x[lo:hi] @ x[clo:chi].T
                ) / _np.outer(nrm[lo:hi], nrm[clo:chi])
                bi, bj = _np.nonzero(s_blk >= eps_threshold)
                upper = (bi + lo) < (bj + clo)  # global upper triangle
                cand_i.append(bi[upper] + lo)
                cand_j.append(bj[upper] + clo)
        ii = _np.concatenate(cand_i)
        jj = _np.concatenate(cand_j)
        if not len(ii):
            return _pd.DataFrame({"d1": [], "d2": [], "cos": []})
        # exact confirm: same IEEE ops in the same order as the
        # cosine_fixed fold (sequential over dims, vectorized over
        # the surviving pairs), in bounded candidate CHUNKS so a
        # many-million-candidate cell never materializes 64-dim
        # float64 copies of both sides at once (element-wise per
        # pair, so chunking cannot change any value)
        ids = pdf[id_name].to_numpy()
        out_d1, out_d2, out_cos = [], [], []
        chunk = 1_000_000
        for lo in range(0, len(ii), chunk):
            ic, jc = ii[lo:lo + chunk], jj[lo:lo + chunk]
            a, b = x[ic], x[jc]
            dot = _np.zeros(len(ic))
            na = _np.zeros(len(ic))
            nb = _np.zeros(len(ic))
            for i in range(d):
                dot = dot + a[:, i] * b[:, i]
                na = na + a[:, i] * a[:, i]
                nb = nb + b[:, i] * b[:, i]
            cos = dot / (_np.sqrt(na) * _np.sqrt(nb))
            keep = cos >= thr
            p, q = ids[ic[keep]], ids[jc[keep]]
            out_d1.append(_np.minimum(p, q))
            out_d2.append(_np.maximum(p, q))
            out_cos.append(cos[keep])
        return _pd.DataFrame(
            {"d1": _np.concatenate(out_d1),
             "d2": _np.concatenate(out_d2),
             "cos": _np.concatenate(out_cos)}
        )

    pairs = (
        celled.groupBy("cell")
        .applyInPandas(
            propose_confirm, schema=f"d1 {id_dt}, d2 {id_dt}, cos double"
        )
        .distinct()  # a pair sharing two top-m cells emits twice,
                     # with bit-identical cos (same arithmetic)
    )
    if with_quarantine:
        return pairs, quarantine
    return pairs


def semantic_dedup_keep(embeddings: DataFrame, threshold: float,
                        n_cells: int = 8, dim: int = 64, top_m: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_cell: int | None = None,
                        centroids=None) -> DataFrame:
    """SemDeDup keep/drop verdict per vector: pairs -> connected
    components -> keep the MIN id of each semantic cluster (the same
    canonical choice as every dedup tier here; the paper keeps an
    arbitrary representative and measured the choice immaterial).
    Returns (id, keep, cluster_id) for EVERY input vector —
    cluster_id null for vectors with no semantic duplicate."""
    from .components import connected_components

    pairs = semantic_neardup_pairs(
        embeddings, threshold, n_cells, dim, top_m, id_col, vec_col,
        max_cell, centroids=centroids,
    )
    comp = connected_components(pairs.select("d1", "d2"))
    return (
        embeddings.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            (F.col("cluster_id").isNull()
             | (F.col("cluster_id") == F.col(id_col))).alias("keep"),
            "cluster_id",
        )
    )


def _read_trained_index_data(spark, index_path: str):
    """The trained index's data rows, or None while the index is
    empty (a bootstrap empty partitioned write leaves only the
    manifest — there are no parquet footers to infer from). A failed
    read first self-heals any half-done rebuild/compaction swap
    (operators/fswap.py), so probes keep working across a crash."""
    from pyspark.sql.utils import AnalysisException

    try:
        return spark.read.parquet(index_path)
    except AnalysisException:
        from .fswap import recover_directory

        if recover_directory(spark, index_path) in (
            "promoted", "rolled_back", "live"
        ):
            spark.catalog.refreshByPath(index_path)
            try:
                return spark.read.parquet(index_path)
            except AnalysisException:
                return None
        return None


def dedup_embeddings_against_index(new_emb: DataFrame, index_path: str,
                                   threshold: float, top_m: int = 2,
                                   id_col: str = "vec_id") -> DataFrame:
    """(new_id, idx_id, cos) semantic near-dup pairs between a new
    batch and the PERSISTENT trained index
    (operators/kmeans.py:write_trained_ivf_index) — the embedding twin
    of operators/fp_index.py's probe. Blocking is asymmetric like the
    fingerprint probe: the BATCH side explodes into its ``top_m``
    nearest trained cells, the index side stays in its one at-rest
    cell, and a pair is a candidate when the index vector's cell is
    among the probe vector's top-m — at least the recall of symmetric
    top-1 blocking, at probe-side-only explosion cost. The scan is
    pruned at PLAN time to the UNION of the batch's probe cells (a
    bounded <= K literal IN-list collected driver-side;
    PartitionFilters asserted in tests/test_semdedup.py), so a small
    batch against a huge index never lists, opens, or schedules the
    directories it cannot match in. The cogroup does exchange the
    surviving index rows by cell — that exchange is BOUNDED by the
    matched cells' population (<= top_m x K directories of index
    data), not by the index size, and the index files themselves are
    never rewritten. Exactly one row per (new_id, idx_id): the index
    vector lives in one cell, so the exploded probe meets it at most
    once. Geometry (centroids, vec_col, dim) always comes from the
    index manifest. The probe assignment is computed ONCE
    (localCheckpoint before the driver-side cell collect) and the
    index listing read once — the cogroup reuses both instead of
    re-deriving them (r8 ADVICE).

    Execution is the same cross-gallery matmul shape as
    semantic_neardup_pairs (and for the same measured reason — a
    per-candidate expression fold runs bytecode-interpreted): the
    probe's and index's cells are COGROUPED, each shared cell is one
    numpy X_probe @ X_index.T proposal at ``threshold - 1e-9``, and
    survivors are confirmed with the exact per-dimension fold —
    bit-identical values to a fold-verified join."""
    from .kmeans import read_trained_ivf_manifest

    spark = new_emb.sparkSession
    model, vec_col = read_trained_ivf_manifest(spark, index_path)
    dim = model.dim
    idx_data = _read_trained_index_data(spark, index_path)
    if idx_data is None:
        # bootstrap: the index exists (manifest written) but holds no
        # vectors yet — an empty partitioned write leaves no parquet
        # footers to read, so answer the probe directly
        return new_emb.select(
            F.col(id_col).alias("new_id"),
            F.col(id_col).alias("idx_id"),
            F.lit(0.0).alias("cos"),
        ).limit(0)
    # materialize the assignment ONCE: the driver-side distinct-cell
    # collect below and the cogroup both consume it — unpinned, the
    # cogroup would re-run the whole MapInPandas assignment
    probe = assign_top_cells(
        new_emb.select(F.col(id_col).alias("pid"),
                       F.col(vec_col).alias("pvec")),
        top_m=top_m, vec_col="pvec", centroids=model,
    ).localCheckpoint(eager=True)
    probe_cells = sorted(
        r.cell for r in probe.select("cell").distinct().collect()
    )
    idx = (
        idx_data
        .where(F.col("cell").isin(probe_cells))
        .select(
            F.col(id_col).alias("iid"),
            F.col(vec_col).alias("ivec"),
            "cell",
        )
    )
    eps_threshold = threshold - 1e-9
    thr = threshold
    d = dim
    id_dt = new_emb.schema[id_col].dataType.simpleString()

    def probe_cell(left, right):
        import numpy as _np
        import pandas as _pd

        empty = _pd.DataFrame({"new_id": [], "idx_id": [], "cos": []})
        if not len(left) or not len(right):
            return empty
        xp = _np.stack(
            [_np.asarray(v, dtype=_np.float64) for v in left["pvec"]]
        )
        xi = _np.stack(
            [_np.asarray(v, dtype=_np.float64) for v in right["ivec"]]
        )
        nrm_p = _np.linalg.norm(xp, axis=1)
        nrm_i = _np.linalg.norm(xi, axis=1)
        # probe-row x index-column tiles, same discipline as
        # semantic_neardup_pairs' kernel: a corpus-sized probe against
        # a large cell would otherwise materialize the full
        # |probe| x |index| float64 matrix, and a row-only tile still
        # grows linearly with the index side — so BOTH dims are tiled
        # (each BLAS block <= TILE x TILE float64 = 134 MB). The
        # margin + exact confirm keep emitted values bit-identical
        # under tiling.
        TILE = 4096
        cand_i, cand_j = [], []
        for lo in range(0, len(xp), TILE):
            hi = min(lo + TILE, len(xp))
            for clo in range(0, len(xi), TILE):
                chi = min(clo + TILE, len(xi))
                s_blk = (
                    xp[lo:hi] @ xi[clo:chi].T
                ) / _np.outer(nrm_p[lo:hi], nrm_i[clo:chi])
                bi, bj = _np.nonzero(s_blk >= eps_threshold)
                cand_i.append(bi + lo)
                cand_j.append(bj + clo)
        ii = _np.concatenate(cand_i)
        jj = _np.concatenate(cand_j)
        if not len(ii):
            return empty
        pid = left["pid"].to_numpy()
        iid = right["iid"].to_numpy()
        out_n, out_x, out_c = [], [], []
        chunk = 1_000_000
        for lo in range(0, len(ii), chunk):
            ic, jc = ii[lo:lo + chunk], jj[lo:lo + chunk]
            a, b = xp[ic], xi[jc]
            dot = _np.zeros(len(ic))
            na = _np.zeros(len(ic))
            nb = _np.zeros(len(ic))
            for i in range(d):
                dot = dot + a[:, i] * b[:, i]
                na = na + a[:, i] * a[:, i]
                nb = nb + b[:, i] * b[:, i]
            cos = dot / (_np.sqrt(na) * _np.sqrt(nb))
            keep = cos >= thr
            out_n.append(pid[ic[keep]])
            out_x.append(iid[jc[keep]])
            out_c.append(cos[keep])
        return _pd.DataFrame(
            {
                "new_id": _np.concatenate(out_n),
                "idx_id": _np.concatenate(out_x),
                "cos": _np.concatenate(out_c),
            }
        )

    return (
        probe.groupBy("cell")
        .cogroup(idx.groupBy("cell"))
        .applyInPandas(
            probe_cell,
            schema=f"new_id {id_dt}, idx_id {id_dt}, cos double",
        )
    )


def ingest_embeddings(new_emb: DataFrame, index_path: str,
                      threshold: float, top_m: int = 2,
                      id_col: str = "vec_id"):
    """One cycle of INCREMENTAL semantic dedup: resolve the batch's
    internal near-dups (trained blocking, min-id keeper — the same
    canonical choice as every dedup tier), probe the survivors against
    the persistent index, admit only vectors that duplicate neither,
    and append the admitted vectors to the index so the NEXT batch is
    checked against them too. Returns (admitted_ids, dup_pairs) with
    dup_pairs in the fp-index ingest shape: index hits as
    (new_id, idx_id, cos) unioned with batch-internal pairs mapped to
    (loser, keeper, cos).

    Replay safety mirrors operators/fp_index.py:ingest_fingerprints: a
    replayed batch's vectors meet their first copies at cosine 1.0
    (>= any sane threshold -> rejected), and the append itself
    excludes ids already present in the index, so a crash-replay
    converges to the same kept set and the index never duplicates."""
    from .kmeans import (
        read_trained_ivf_manifest,
        write_trained_ivf_index,
    )

    spark = new_emb.sparkSession
    model, vec_col = read_trained_ivf_manifest(spark, index_path)
    batch = new_emb.localCheckpoint(eager=True)

    internal = semantic_neardup_pairs(
        batch, threshold, dim=model.dim, top_m=top_m,
        id_col=id_col, vec_col=vec_col, centroids=model,
    ).localCheckpoint(eager=True)
    # min-id resolution: d1 < d2 by construction, so d2 is the loser
    losers = internal.select(F.col("d2").alias(id_col)).distinct()
    survivors = batch.join(losers, id_col, "left_anti")

    index_hits = dedup_embeddings_against_index(
        survivors, index_path, threshold, top_m, id_col
    ).localCheckpoint(eager=True)
    dup_new = index_hits.select(F.col("new_id").alias(id_col)).distinct()
    admitted = survivors.join(dup_new, id_col, "left_anti")

    # exclude ids already present (replayed appends must be no-ops);
    # column-pruned id scan, broadcast against the bounded batch
    idx_data = _read_trained_index_data(spark, index_path)
    if idx_data is not None:
        present = idx_data.select(F.col(id_col)).distinct()
        to_append = admitted.join(present, id_col, "left_anti")
    else:
        to_append = admitted
    to_append = to_append.localCheckpoint(eager=True)
    write_trained_ivf_index(
        to_append.select(id_col, vec_col), model, index_path,
        vec_col=vec_col, append=True,
    )
    spark.catalog.refreshByPath(index_path)

    dup_pairs = index_hits.unionByName(
        internal.select(
            F.col("d2").alias("new_id"),
            F.col("d1").alias("idx_id"),
            "cos",
        )
    )
    return admitted.select(id_col), dup_pairs


def streaming_ingest_embeddings(stream_emb: DataFrame, index_path: str,
                                checkpoint_dir: str, threshold: float,
                                model=None, top_m: int = 2,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                on_admitted=None,
                                compact_every: int | None = None):
    """Continuous semantic dedup: every micro-batch of the embedding
    stream is deduped against the trained index (and against itself)
    and its survivors appended — ``readStream ->
    foreachBatch(ingest_embeddings)``, the embedding twin of
    operators/fp_index.py:streaming_ingest_fingerprints. Returns the
    started StreamingQuery.

    Bootstrap: when ``index_path`` has no manifest, ``model`` (a
    KMeansModel) is REQUIRED and an empty index is written under its
    centroids — unlike the fingerprint layout there is no defaultable
    geometry; train on a representative sample first. When a manifest
    exists, it wins and ``model`` is ignored (the manifest's centroids
    are the only ones the at-rest cells are valid under).

    Replay safety is ingest_embeddings' contract: replayed vectors
    meet their first copies at cosine 1.0 (rejected) and the append
    excludes present ids. ``on_admitted(ids_df, batch_id)`` delivers
    at-least-once END TO END (r14, closing the r13 caveat): on a
    replay, ids that self-match the index (new_id == idx_id — only
    possible when a previous run admitted them) are joined back and
    handed down again alongside fresh admissions; downstream must be
    idempotent keyed on the id.

    ``compact_every=N`` runs compact_trained_ivf_index every N
    micro-batches, INSIDE the foreachBatch callback — micro-batches
    execute serially, so the compaction's "never concurrent with an
    append" contract holds by construction instead of by operator
    discipline. Compaction is layout hygiene (probes bit-identical
    before/after), so a replayed batch re-running it is harmless, and
    a crash mid-compaction self-heals through the fswap recovery on
    the next probe/append. The trigger is ``batch_id % N == N - 1``
    (batch_id is stable across replays, so the cadence is too)."""
    from .kmeans import read_trained_ivf_manifest, write_trained_ivf_index

    spark = stream_emb.sparkSession
    try:
        read_trained_ivf_manifest(spark, index_path)
    except FileNotFoundError:
        if model is None:
            raise ValueError(
                f"no trained index at {index_path!r} and no model "
                "given to bootstrap one — fit centroids on a "
                "representative sample first (operators/kmeans.py)"
            )
        empty = local_df(
            spark, [], stream_emb.select(id_col, vec_col).schema
        )
        write_trained_ivf_index(empty, model, index_path, vec_col)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        admitted, dups = ingest_embeddings(
            batch_df.select(id_col, vec_col), index_path, threshold,
            top_m, id_col,
        )
        if on_admitted is not None:
            # at-least-once hand-off across the crash seam (r13
            # VERDICT #3): a replayed batch's previously-admitted
            # vectors meet their own first copies as SELF pairs
            # (new_id == idx_id at cosine 1.0 — only possible when
            # this id is already in the index). Join them back so a
            # crash between the index append and the downstream
            # commit no longer loses the batch; downstream stays
            # idempotent keyed on the id (the foreachBatch contract).
            prev = dups.where(
                F.col("new_id") == F.col("idx_id")
            ).select(F.col("new_id").alias(id_col)).distinct()
            on_admitted(
                admitted.unionByName(prev).distinct(), batch_id
            )
        if compact_every is not None and batch_id % compact_every == (
            compact_every - 1
        ):
            from .kmeans import compact_trained_ivf_index

            compact_trained_ivf_index(batch_df.sparkSession, index_path)

    return (
        stream_emb.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
