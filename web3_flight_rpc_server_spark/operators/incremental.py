"""Incremental near-dup detection against a persisted MinHash index.

The one-shot pipeline (operators/dedup.py:minhash_lsh_dedup_pairs)
re-signatures the WHOLE corpus every run. At 100 TB that is the wrong
shape for the workload that actually occurs: a corpus snapshot is
already curated, and each day a new batch (orders of magnitude
smaller) must be checked against it — and against itself — before
being appended. This module persists the two artifacts that make that
incremental:

- ``bands/``    (doc_id, band, bucket): banded LSH signatures — the
                probe side of candidate generation. The bucket values
                come from operators/dedup.py:banded_signatures, the
                SAME derivation the one-shot pipeline uses, so an
                indexed corpus and a fresh batch always collide in
                identical buckets.
- ``shingles/`` (doc_id, shs, sz): distinct shingle arrays — exact
                Jaccard verification of candidates without re-reading
                or re-tokenizing the corpus text.

Scale shape: checking a batch of b docs against an index of N docs
costs signatures over b docs plus ONE equi-join of b x bands probe
rows against the bands dataset keyed on (band, bucket) — never a
rescan of the N-doc text, never all-pairs. The join shuffles only the
(tiny) probe side when the bands dataset is written bucketed on
``bucket`` (sources/bucketed.py:write_bucketed via a metastore table);
the plain-parquet layout here keeps the index a portable directory and
still reduces the join to candidate buckets. Verification then joins
the (small) candidate set to both shingle tables in-row
(array_intersect) — AQE broadcasts it at runtime.

No counterpart in the reference (its only dedup surface is the
``removed`` passthrough, Converter.java:169); this is north-star C11
taken to its production ingestion shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _persisted,
    agg_signatures,
    banded_signatures,
    shingle_sets,
)

DEFAULT_NUM_HASHES = 32
DEFAULT_BANDS = 8


def _bands_path(path: str) -> str:
    return os.path.join(path, "bands")


def _shingles_path(path: str) -> str:
    return os.path.join(path, "shingles")


def write_minhash_index(docs: DataFrame, path: str,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        bands: int = DEFAULT_BANDS,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, append: bool = False) -> None:
    """Write (or append a new batch to) the MinHash index at ``path``.

    ``append=True`` is the ingestion loop: after a batch passes
    :func:`dedup_against_index`, index its survivors so the NEXT batch
    is checked against them too. Appends are partition-additive
    parquet writes — no rewrite of existing index files. The caller
    owns id uniqueness across appends (deterministic doc ids, e.g.
    content-hash-derived, make replays idempotent)."""
    mode = "append" if append else "overwrite"
    sets = _persisted(shingle_sets(docs, id_col, text_col, n))
    sigs = agg_signatures(sets, num_hashes, id_col)
    banded_signatures(sigs, bands, id_col).write.mode(mode).parquet(
        _bands_path(path)
    )
    sets.write.mode(mode).parquet(_shingles_path(path))


def dedup_against_index(new_docs: DataFrame, path: str,
                        threshold: float = 0.5,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        bands: int = DEFAULT_BANDS,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Near-dup pairs between a new batch and the indexed corpus.

    Output (new_id, idx_id, jaccard) with jaccard >= threshold —
    exact-verified, so precision is 1 by construction; recall is the
    banding recall of the underlying LSH (identical to the one-shot
    pipeline's, because signatures and buckets are derived by the same
    functions). Batch-internal duplicates are NOT reported here — run
    minhash_lsh_dedup_pairs on the batch itself for those."""
    spark = new_docs.sparkSession
    if not os.path.exists(_bands_path(path)):
        raise FileNotFoundError(
            f"no MinHash index at {path!r} — write the first corpus "
            "snapshot with write_minhash_index() before probing it"
        )
    new_sets = _persisted(shingle_sets(new_docs, id_col, text_col, n))
    new_banded = banded_signatures(
        agg_signatures(new_sets, num_hashes, id_col), bands, id_col
    )

    idx_bands = spark.read.parquet(_bands_path(path))
    probe = new_banded.select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    cands = (
        probe.join(
            idx_bands.select(
                F.col(id_col).alias("idx_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select("new_id", "idx_id")
        .distinct()
    )

    idx_sets = spark.read.parquet(_shingles_path(path)).select(
        F.col(id_col).alias("idx_id"),
        F.col("shs").alias("shs_i"),
        F.col("sz").alias("sz_i"),
    )
    batch_sets = new_sets.select(
        F.col(id_col).alias("new_id"),
        F.col("shs").alias("shs_n"),
        F.col("sz").alias("sz_n"),
    )
    inter = F.size(F.array_intersect("shs_n", "shs_i"))
    return (
        cands.join(batch_sets, "new_id")
        .join(idx_sets, "idx_id")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_n") + F.col("sz_i") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "idx_id", "jaccard")
    )


def ingest_batch(new_docs: DataFrame, path: str,
                 threshold: float = 0.5,
                 num_hashes: int = DEFAULT_NUM_HASHES,
                 bands: int = DEFAULT_BANDS,
                 id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """One step of the incremental ingestion loop: report the batch's
    near-dups against the index, append only the NON-duplicate batch
    docs to it, and return the kept docs. Batch-internal near-dups are
    resolved first (smallest id wins) so two copies arriving in the
    same batch cannot both be admitted."""
    from .dedup import minhash_lsh_dedup_pairs

    vs_index = dedup_against_index(
        new_docs, path, threshold, num_hashes, bands, id_col, text_col, n
    ).select(F.col("new_id").alias(id_col)).distinct()
    internal = minhash_lsh_dedup_pairs(
        new_docs, threshold, num_hashes, bands, id_col, text_col, n
    ).select(F.col("d2").alias(id_col)).distinct()
    kept = (
        new_docs.join(vs_index, id_col, "left_anti")
        .join(internal, id_col, "left_anti")
    )
    # Materialize BEFORE the append — with a LINEAGE CUT, not a mere
    # persist: the kept plan embeds a probe of the index path, and the
    # parquet append triggers refreshByPath, which invalidates any
    # cache entry whose plan reads that path; the lazy recompute would
    # then see the just-admitted docs in the index and anti-join them
    # against themselves (observed: empty result). localCheckpoint
    # severs the plan from the path entirely. (At cluster scale with
    # executor loss in play, use a reliable checkpoint dir instead.)
    kept = kept.localCheckpoint(eager=True)
    write_minhash_index(
        kept, path, num_hashes, bands, id_col, text_col, n, append=True
    )
    return kept
