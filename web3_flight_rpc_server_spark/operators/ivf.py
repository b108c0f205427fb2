"""IVF-style ANN over embeddings (C12 scale path #2).

Inverted-file search: assign every vector to its nearest of K anchor
points, search only the query's closest cell(s). Unlike trained
k-means, the anchors are DETERMINISTIC seeded pseudo-random vectors —
no training pass, reproducible across runs — embedded in the plan as
LITERAL arrays so the assignment is a constant-folded argmax over K
dot products: no per-row hashing, no shuffle, no Python.

Recall is tuned with n_probe: searching p of K cells scans ~p/K of
the corpus. At 100 TB the cell id becomes the partition key: vectors
are written partitioned by cell, a query prunes to n_probe
directories, and each cell scan is an independent task — the cross
product never exists.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine

_SEED = 0x5EED


def _anchors(n_cells: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(_SEED)
    return rng.uniform(-1.0, 1.0, size=(n_cells, dim))


def _dot_literal(vec_col: Column, anchor_row: np.ndarray) -> Column:
    """Dot product of a vector column with a literal anchor (the
    literal array folds at plan time)."""
    lit_anchor = F.array(*[F.lit(float(v)) for v in anchor_row])
    return F.aggregate(
        F.zip_with(vec_col, lit_anchor, lambda x, a: x.cast("double") * a),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(embeddings: DataFrame, n_cells: int = 16, dim: int = 64,
                 vec_col: str = "embedding") -> DataFrame:
    """Add the nearest-anchor cell id (argmax of K dot products inside
    one expression)."""
    anchors = _anchors(n_cells, dim)
    scores = F.array(*[_dot_literal(F.col(vec_col), a) for a in anchors])
    cell = (
        F.expr("array_position(__ivf_scores, array_max(__ivf_scores))")
        .cast("int") - 1
    )
    return (
        embeddings.withColumn("__ivf_scores", scores)
        .withColumn("cell", cell)
        .drop("__ivf_scores")
    )


def write_ivf_index(embeddings: DataFrame, path: str, n_cells: int = 16,
                    dim: int = 64, vec_col: str = "embedding") -> None:
    """Materialize the cell-partitioned layout: one directory per cell
    (`cell=N/`). At 100 TB this is the index — assignment happens once
    at write time, and every later query prunes to its probe cells'
    directories without touching the rest of the corpus."""
    assign_cells(embeddings, n_cells, dim, vec_col).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def probe_cells_for(query_vec, n_cells: int = 16, n_probe: int = 4,
                    dim: int = 64) -> list[int]:
    """Driver-side probe selection: K dot products over the literal
    anchors (numpy, microseconds, no Spark job) so the probe list can
    be embedded in the scan filter as a constant."""
    anchors = _anchors(n_cells, dim)
    scores = anchors @ np.asarray(query_vec, dtype=float)
    order = np.argsort(-scores, kind="stable")
    return [int(i) for i in order[:n_probe]]


def ivf_topk_partitioned(spark, path: str, query_vec, k: int = 10,
                         n_cells: int = 16, n_probe: int = 4, dim: int = 64,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Top-k over a `write_ivf_index` layout. The probe list is a
    literal IN-filter on the partition column, so the scan prunes to
    n_probe directories at plan time (PartitionFilters in explain) —
    non-probed cells are never listed, opened, or scheduled. Same
    (id, cos) contract as ivf_topk/cosine_topk."""
    probes = probe_cells_for(query_vec, n_cells, n_probe, dim)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    scanned = spark.read.parquet(path).where(F.col("cell").isin(probes))
    scored = scanned.select(
        id_col, cosine(F.col(vec_col), qlit).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def ivf_topk(embeddings: DataFrame, query: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's n_probe
    nearest cells. Returns (id, cos) ordered like cosine_topk."""
    anchors = _anchors(n_cells, dim)
    celled = assign_cells(embeddings, n_cells, dim, vec_col)

    qscores = query.select(
        F.col(vec_col).alias("__qvec"),
        F.array(*[_dot_literal(F.col(vec_col), a) for a in anchors]).alias("s"),
    ).select(
        "__qvec",
        F.slice(
            F.expr(
                "transform(array_sort(zip_with(s, sequence(0, size(s)-1), "
                "(v, i) -> struct(-v AS negv, i AS idx))), p -> p.idx)"
            ),
            1,
            n_probe,
        ).alias("probe_cells"),
    )

    candidates = celled.join(
        F.broadcast(qscores),
        F.array_contains(F.col("probe_cells"), F.col("cell")),
    )
    scored = candidates.select(
        id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
