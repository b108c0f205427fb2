"""Product quantization (PQ) ANN tier: the memory lever for
100 TB embedding corpora. A 64-dim float vector (256 bytes as
float32) compresses to ``m`` one-byte codes (default 16 bytes — 16x),
so a corpus that would spill every executor fits in memory, and query
scoring becomes ``m`` table lookups per vector instead of ``dim``
multiplies.

Defaults (m=16 subvectors, k=64 centroids -> 16 bytes/vector, 16x)
are tuned for the HARD case — near-isotropic unit vectors like the
synthetic fixture, where quantization has the least structure to
exploit; real embedding corpora (correlated dimensions) compress
better at the same recall. Measured on the fixture (sf0.01, 500
vectors, recall@10 vs exact, 20 queries): m8/k16 0.25, m8/k64 0.47,
m16/k16 0.44, m16/k64 0.63, m32/k16 0.71 — and the exact RE-RANK
stage (:func:`pq_topk_rerank`, the standard deployment) lifts the
m16/k64 shortlist to ~1.0 recall@10 while exact-scoring only the
shortlist.

The three classic stages, each in its Spark-idiomatic shape:

- TRAIN (driver, bounded): k-means per subvector on a deterministic
  sample — codebook size is m x k x (dim/m) floats (default
  16x64x4 = 32 KB), a literal the plan carries; the sample is capped so
  the driver collect is O(sample x dim), never O(corpus).
- ENCODE (executors, Arrow): mapInPandas argmin over the codebook per
  subvector -> ``codes array<int>`` of m entries in [0, k).
- SCORE/ADC (executors, JVM codegen): the query vector folds with the
  codebook into an m x k table of partial inner products
  DRIVER-SIDE; per-vector score = sum over subvectors of
  ``element_at(<literal table row>, code+1)`` — m element_at calls on
  literal float arrays, whole-stage-codegen'd, zero Python and zero
  shuffle until the global top-k (TakeOrdered).

Asymmetric distance (ADC): the query stays exact, only the corpus is
quantized — the standard recall/compression trade. Recall floors are
pinned against exact cosine in tests/test_pq.py; compose with the IVF
index (operators/ivf.py) for cell pruning + PQ scoring at scale.

No counterpart in the reference (its fixture has no vector surface).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.localdf import local_df

PQ_DEFAULT_M = 16
PQ_DEFAULT_K = 64


def pq_train(embeddings: DataFrame, m: int = PQ_DEFAULT_M,
             k: int = PQ_DEFAULT_K, dim: int = 64,
             sample: int = 2048, seed: int = 7,
             vec_col: str = "embedding",
             order_col: str | None = "vec_id") -> np.ndarray:
    """Train PQ codebooks: plain Lloyd k-means per subvector on a
    deterministic sample. Returns (m, k, dim//m) float64 — small
    enough to embed as plan literals. The sample cap bounds the driver
    collect to O(sample x dim); ``order_col`` pins WHICH rows the
    sample takes (the lowest ids, via TakeOrdered — a bare limit()
    would float with partition layout and silently retrain different
    codebooks on the same corpus), and ``seed`` pins the k-means
    initialization — together retraining reproduces the codebooks
    byte-identically (deterministic artifacts, the q_train_split
    discipline). Pass ``order_col=None`` only when the input is
    already a deterministic single-source slice."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sampled = embeddings
    if order_col is not None:
        sampled = sampled.orderBy(order_col)
    rows = sampled.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    if x.shape[0] < k:
        raise ValueError(
            f"sample of {x.shape[0]} vectors cannot train k={k} centroids"
        )
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        pts = x[:, j * sub:(j + 1) * sub]
        centroids = pts[rng.choice(len(pts), size=k, replace=False)].copy()
        for _ in range(25):
            d2 = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            moved = 0.0
            for c in range(k):
                sel = pts[assign == c]
                if len(sel):
                    nc = sel.mean(0)
                    moved += float(((nc - centroids[c]) ** 2).sum())
                    centroids[c] = nc
            if moved < 1e-12:
                break
        books[j] = centroids
    return books


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id[, keep_cols...], codes: array<int>) — each vector's m
    nearest-centroid indices. Arrow-batched, partition-preserving, no
    shuffle; the codebook rides the closure by value (~32 KB).
    ``keep_cols`` pass through untouched (e.g. a precomputed IVF cell
    id, so the composed index is built in ONE executor pass with no
    join back)."""
    m, k, sub = codebooks.shape
    books = codebooks.copy()
    kept_schema = "".join(
        f", {name} {dtype.simpleString()}"
        for name, dtype in (
            (c, embeddings.schema[c].dataType) for c in keep_cols
        )
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(list(pdf[vec_col]), dtype=np.float64)
            out = {id_col: pdf[id_col].values}
            for c in keep_cols:
                out[c] = pdf[c].values
            if vecs.size == 0:
                out["codes"] = []
                yield pd.DataFrame(out)
                continue
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                pts = vecs[:, j * sub:(j + 1) * sub]
                d2 = ((pts[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    return embeddings.mapInPandas(
        enc, schema=f"{id_col} long{kept_schema}, codes array<int>"
    )


def _adc_score(codes_col: str, query: np.ndarray,
               codebooks: np.ndarray) -> Column:
    """The ADC inner-product expression: query (x) codebook folds into
    an m x k literal table; score = sum_j table[j][codes[j]]. Pure
    JVM-codegen — m element_at calls on literal float arrays."""
    m, k, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    table = np.einsum("mkd,md->mk", codebooks, q.reshape(m, sub))
    score = F.lit(0.0)
    for j in range(m):
        row = F.array(*[F.lit(float(v)) for v in table[j]])
        score = score + F.element_at(
            row, F.element_at(F.col(codes_col), j + 1) + F.lit(1)
        )
    return score


def pq_topk(codes: DataFrame, query, codebooks: np.ndarray,
            k: int = 10, id_col: str = "vec_id") -> DataFrame:
    """Top-k by asymmetric PQ inner product: (id, score) descending,
    deterministic tie-break on id. The scan projects only
    (id, codes); the only wide operation is the global TakeOrdered."""
    scored = codes.select(
        id_col, _adc_score("codes", query, codebooks).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def pq_topk_rerank(codes: DataFrame, embeddings: DataFrame, query,
                   codebooks: np.ndarray, k: int = 10,
                   shortlist: int = 100, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """The standard PQ deployment: ADC shortlists ``shortlist``
    candidates from the compressed codes (cheap, whole corpus), then
    ONLY those fetch their exact vectors and re-score with the true
    inner product (dim-unrolled literal expression, still JVM-side).
    Output (id, score) — the exact scores of the final top-k, so
    ranking quality degrades only through shortlist recall, which the
    measured table above shows is the right place to spend bytes.
    The shortlist ids broadcast into the join: at any corpus size the
    exact-scoring side touches ``shortlist`` rows, not the corpus."""
    q = np.asarray(query, dtype=np.float64)
    short = pq_topk(codes, q, codebooks, k=shortlist, id_col=id_col) \
        .select(id_col)
    exact = F.lit(0.0)
    for i, qi in enumerate(q):
        exact = exact + F.element_at(F.col(vec_col), i + 1) * F.lit(float(qi))
    return (
        embeddings.join(F.broadcast(short), id_col, "left_semi")
        .select(id_col, exact.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_pq_index(embeddings: DataFrame, path: str,
                       codebooks: np.ndarray, n_cells: int = 8,
                       dim: int = 64, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> None:
    """IVF + PQ composed at rest: PQ codes written PARTITIONED BY the
    nearest-anchor cell (operators/ivf.py's anchors), so a probe scan
    prunes the non-probed cells at plan time AND reads 16-byte codes
    instead of 256-byte vectors — the two levers multiply (probe 3 of
    8 cells at 16x compression = ~2.3% of the raw-bytes scan). The
    codebooks persist beside the codes (``_pq_codebooks``) so queries
    load them instead of retraining. The rebuild is the whole-directory
    atomic swap (operators/fswap.py:rebuild_directory — r9): codes and
    both manifests land under one tmp sibling and promote together, so
    no crash window leaves new codes under old codebooks."""
    from .ivf import assign_cells

    m, k, sub = codebooks.shape
    # ONE executor pass: cell assignment (JVM expression) happens in
    # the scan projection, the encode carries it through — no join
    # back, no second read of the vectors
    coded = pq_encode(
        assign_cells(embeddings, n_cells, dim, vec_col),
        codebooks, id_col, vec_col, keep_cols=("cell",),
    )
    spark = embeddings.sparkSession

    def _write_all(tmp: str) -> None:
        coded.write.mode("overwrite").partitionBy("cell").parquet(
            tmp.rstrip("/") + "/codes"
        )
        book_rows = [
            (j, c, [float(v) for v in codebooks[j][c]])
            for j in range(m) for c in range(k)
        ]
        local_df(
            spark, book_rows, "j int, c int, vals array<double>"
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_pq_codebooks"
        )
        local_df(
            spark, [(n_cells, dim, m, k, id_col)],
            "n_cells int, dim int, m int, k int, id_col string",
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_pq_manifest"
        )

    from .fswap import rebuild_directory

    rebuild_directory(spark, path, _write_all)


def write_trained_ivf_pq_index(embeddings: DataFrame, model,
                               path: str, codebooks: np.ndarray,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               append: bool = False) -> None:
    """TRAINED IVF + PQ composed at rest — the full production ANN
    layout for a 100 TB embedding corpus: PQ codes partitioned by the
    nearest TRAINED-centroid cell (operators/kmeans.py — real clusters
    land whole in one directory, the locality the untrained anchors
    can't give), so a probe prunes to its cells at plan time AND reads
    16-byte codes instead of raw vectors. Both models persist beside
    the codes: the k-means centroids under ``_kmeans_manifest/``
    (same layout as write_trained_ivf_index, so the same readers work)
    and the PQ codebooks/manifest under ``_pq_codebooks``/
    ``_pq_manifest``. The rebuild is the whole-directory atomic swap
    (operators/fswap.py:rebuild_directory): codes and all three
    manifests land under one tmp sibling and promote together — no
    crash window leaves new codes under old codebooks or centroids —
    and reads self-heal through the swap.

    ``append=True`` is the ingestion path and carries BOTH refusal
    contracts: new batches are assigned and encoded under the
    MANIFESTS' models, and a bit-level mismatch of either (retrained
    centroids -> wrong directories; retrained codebooks -> codes that
    score against the wrong table) is refused — retrain means rebuild.
    The two mapInPandas stages (assign, encode) pipeline inside one
    task; no shuffle until the partitioned write."""
    from .kmeans import assign_trained_cells, read_trained_ivf_manifest

    spark = embeddings.sparkSession
    m, k, sub = codebooks.shape
    if append:
        m_model, m_vec = read_trained_ivf_manifest(spark, path)
        if m_vec != vec_col or not np.array_equal(
            m_model.centroids, model.centroids
        ):
            raise ValueError(
                f"trained IVF+PQ index at {path!r} was built under "
                "different centroids/vec_col — appending would assign "
                "new codes into wrong cell directories; rebuild instead"
            )
        if not np.array_equal(read_pq_codebooks(spark, path), codebooks):
            raise ValueError(
                f"trained IVF+PQ index at {path!r} was built under "
                "different PQ codebooks — appended codes would score "
                "against the wrong ADC table; rebuild instead"
            )
    coded = pq_encode(
        assign_trained_cells(embeddings, model, vec_col),
        codebooks, id_col, vec_col, keep_cols=("cell",),
    )
    if append:
        from .fswap import recover_directory

        # TWO swap levels exist (the same double recovery the
        # compaction does): the whole-index rebuild swaps PATH, while
        # compact_trained_ivf_pq_index swaps codes/ directly. An
        # append that recovered only the root could recreate a
        # mid-compaction codes/ containing nothing but the new batch —
        # the next recovery would then see a live codes/ and delete
        # codes.old, permanently stranding the pre-compaction history
        # (fswap's "MUST be called before any append" contract, at
        # BOTH levels; r9 ADVICE).
        recover_directory(spark, path)
        recover_directory(spark, path.rstrip("/") + "/codes")
        coded.write.mode("append").partitionBy("cell").parquet(
            path.rstrip("/") + "/codes"
        )
        return

    # rebuild: EVERY dataset (codes + all three manifests) lands under
    # one tmp sibling and swaps in atomically — an in-place rebuild
    # has windows where new codes sit under old codebooks/centroids,
    # which scores silently wrong (operators/fswap.py:rebuild_directory)
    def _write_all(tmp: str) -> None:
        coded.write.mode("overwrite").partitionBy("cell").parquet(
            tmp.rstrip("/") + "/codes"
        )
        cent_rows = [
            (int(i), [float(x) for x in c], vec_col)
            for i, c in enumerate(model.centroids)
        ]
        local_df(
            spark, cent_rows,
            "cell int, centroid array<double>, vec_col string"
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_kmeans_manifest"
        )
        book_rows = [
            (j, c, [float(v) for v in codebooks[j][c]])
            for j in range(m) for c in range(k)
        ]
        local_df(
            spark, book_rows, "j int, c int, vals array<double>"
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_pq_codebooks"
        )
        local_df(
            spark, [(int(model.k), int(model.dim), m, k, id_col)],
            "n_cells int, dim int, m int, k int, id_col string",
        ).write.mode("overwrite").parquet(
            tmp.rstrip("/") + "/_pq_manifest"
        )

    from .fswap import rebuild_directory

    rebuild_directory(spark, path, _write_all)


def compact_trained_ivf_pq_index(spark, path: str,
                                 target_file_bytes: int = 128 * 1024 * 1024
                                 ) -> tuple[int, int]:
    """Small-file hygiene for an append-heavy composed index: fold
    ``codes/`` back into ~``target_file_bytes`` files while preserving
    the cell partitioning (rows shuffle on the cell column, so a cell
    stays together under its directory). The models live OUTSIDE
    ``codes/`` (``_kmeans_manifest``/``_pq_codebooks``/
    ``_pq_manifest``), so the swap is a plain fswap promote of the
    codes directory — no manifest-copy step. Same discipline as every
    compaction here: run between ingest cycles; crash-safe at every
    intermediate state; probes bit-identical before/after. Returns
    (files_before, files_after); (0, 0) when empty."""
    from .fswap import (
        TMP_SUFFIX,
        _hadoop,
        promote_directory,
        recover_directory,
    )

    codes_dir = path.rstrip("/") + "/codes"
    # two swap levels exist: the whole-index rebuild swaps PATH, this
    # compaction swaps codes/ — recover both (a stranded rebuild would
    # otherwise leave no codes/ at all to list)
    recover_directory(spark, path)
    recover_directory(spark, codes_dir)
    spark.catalog.refreshByPath(codes_dir)
    fs, jvm, codes_p = _hadoop(spark, codes_dir)

    def _data_files():
        files = []
        it = fs.listFiles(codes_p, True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(".parquet"):
                files.append((p, int(st.getLen())))
        return files

    before = _data_files()
    if not before:
        return (0, 0)
    total_bytes = sum(sz for _, sz in before)
    n_parts = max(1, -(-total_bytes // target_file_bytes))
    df = spark.read.parquet(codes_dir)
    tmp = codes_dir + TMP_SUFFIX
    df.repartition(int(n_parts), F.col("cell")).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(tmp)
    promote_directory(spark, codes_dir, tmp)
    spark.catalog.refreshByPath(codes_dir)
    return (len(before), len(_data_files()))


def trained_ivf_pq_topk(spark, path: str, query, k: int = 10,
                        n_probe: int = 3,
                        rerank_with: DataFrame | None = None,
                        shortlist: int = 100) -> DataFrame:
    """Top-k from the trained composed index: probe cells chosen
    driver-side against the persisted TRAINED centroids
    (trained_probe_cells — same argmin contract as the write), pruned
    at plan time (PartitionFilters), ADC over only the probed cells'
    codes. Full probe degrades exactly to global pq_topk over all
    codes — the same invariant the untrained composition pins.

    ``rerank_with`` (the raw-vector table, e.g. the trained IVF index
    or the source embeddings) adds the standard exact re-rank stage:
    ADC shortlists ``shortlist`` ids from the compressed codes, only
    those fetch raw vectors (broadcast semi-join) and re-score with
    the exact inner product — final scores exact, corpus reads stay
    16 bytes/vector."""
    from .kmeans import read_trained_ivf_manifest, trained_probe_cells

    man = _read_pq_manifest_row(spark, path)
    model, vec_col = read_trained_ivf_manifest(spark, path)
    books = read_pq_codebooks(spark, path)
    cells = trained_probe_cells(query, model, n_probe)
    codes = _read_codes(spark, path).where(F.col("cell").isin(cells))
    if rerank_with is None:
        return pq_topk(codes, query, books, k, id_col=man.id_col)
    return pq_topk_rerank(
        codes, rerank_with, query, books, k=k, shortlist=shortlist,
        id_col=man.id_col, vec_col=vec_col,
    )


def _read_codes(spark, path: str) -> DataFrame:
    """The index's ``codes/`` dataset; a failed read first self-heals
    a half-done CODES-LEVEL compaction swap
    (compact_trained_ivf_pq_index swaps codes/ directly, not the index
    root), so probes keep working across a compaction crash — the
    codes-level twin of _read_pq_manifest_row's root-level self-heal
    (r9 ADVICE: the "crash-safe at every intermediate state" claim
    must hold for BOTH swap levels a reader can encounter)."""
    from pyspark.sql.utils import AnalysisException

    codes_dir = path.rstrip("/") + "/codes"
    try:
        return spark.read.parquet(codes_dir)
    except AnalysisException:
        from .fswap import recover_directory

        if recover_directory(spark, codes_dir) in (
            "promoted", "rolled_back",
        ):
            spark.catalog.refreshByPath(codes_dir)
            return spark.read.parquet(codes_dir)
        raise


def _read_pq_manifest_row(spark, path: str):
    """The _pq_manifest row; a failed read first self-heals any
    half-done whole-directory rebuild swap at ``path``
    (operators/fswap.py), so probes keep working across a rebuild
    crash."""
    from pyspark.sql.utils import AnalysisException

    mpath = path.rstrip("/") + "/_pq_manifest"
    try:
        return spark.read.parquet(mpath).collect()[0]
    except AnalysisException:
        from .fswap import recover_directory

        if recover_directory(spark, path) in ("promoted", "rolled_back"):
            spark.catalog.refreshByPath(path)
            spark.catalog.refreshByPath(mpath)
            return spark.read.parquet(mpath).collect()[0]
        raise


def read_pq_codebooks(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(
        path.rstrip("/") + "/_pq_codebooks"
    ).collect()
    m = max(r.j for r in rows) + 1
    k = max(r.c for r in rows) + 1
    sub = len(rows[0].vals)
    books = np.empty((m, k, sub))
    for r in rows:
        books[r.j][r.c] = r.vals
    return books


def ivf_pq_topk(spark, path: str, query, k: int = 10,
                n_probe: int = 3) -> DataFrame:
    """Top-k from the composed index: probe cells chosen driver-side
    from the SAME literal-anchor arithmetic the write used (so the
    cell filter is a constant the scan prunes partitions with —
    PartitionFilters in explain), then ADC over only the probed
    cells' codes. Full probe (n_probe = n_cells) degrades exactly to
    global pq_topk over all codes — the invariant the tests pin."""
    man = _read_pq_manifest_row(spark, path)
    books = read_pq_codebooks(spark, path)
    from .ivf import probe_cells_for

    cells = probe_cells_for(query, int(man.n_cells), n_probe, int(man.dim))
    codes = _read_codes(spark, path).where(F.col("cell").isin(cells))
    return pq_topk(codes, query, books, k, id_col=man.id_col)
