"""Mergeable distinct-count sketches (Datasketches HLL, §2C9 depth).

The 100 TB serving pattern behind every "distinct users per X"
dashboard: exact COUNT(DISTINCT) over raw events shuffles the full key
set on EVERY question, so at scale the answer is pre-aggregation into
mergeable sketches. One pass over raw data builds a tiny binary sketch
per bucket (e.g. per day x event_type, ~2^lg_k bytes each); persisted,
those sketch rows answer any rollup — arbitrary date ranges, any group
subset — by merging sketches only, never rescanning raw events. The
union is associative and commutative, so partial merges (day -> week
-> total) are exact re-aggregations, the same property that makes the
rollup safe to distribute map-side.

The reference's notebook computes nunique() per slice over collected
pandas frames (notebook cells 8/24 — the q_distinct_count lineage);
this operator is the scale path for the same question. Spark built-ins
only (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, JVM
Datasketches — no UDFs); DuckDB has no wire-compatible HLL, so the
cross-engine check compares estimates to exact distincts under the
sketch's accuracy contract (see queries/sampling.py:q_sketch_rollup),
the same shape q_distinct_count uses for approx_count_distinct.

lg_k pins the sketch's register count (2^lg_k): accuracy ~1.04/sqrt(2^lg_k)
relative standard error — lg_k=12 gives ~1.6%, 4 KB per bucket. Merging
sketches built at different lg_k silently degrades to the coarser
config; like the MinHash index's manifest (operators/incremental.py),
the persisted layout pins lg_k and refuses mismatched merges unless
explicitly allowed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "__hll_sketch"
DEFAULT_LG_K = 12


def build_distinct_sketches(df: DataFrame, bucket_cols: list[str],
                            value_col: str,
                            lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """One HLL sketch per bucket: ``bucket_cols`` + a binary sketch of
    the distinct ``value_col`` values in that bucket, plus the build
    config as a column so persisted layouts are self-describing.

    One hash shuffle on the bucket key with map-side partial sketches
    (hll_sketch_agg is a partial-merge aggregate) — the only pass that
    ever touches raw rows.
    """
    if not (4 <= lg_k <= 21):
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(SKETCH_COL),
        F.lit(lg_k).alias("lg_k"),
    )


def rollup_distinct(sketches: DataFrame, group_cols: list[str],
                    allow_different_lg_k: bool = False,
                    estimate_col: str = "n_distinct_est") -> DataFrame:
    """Merge bucket sketches up to ``group_cols`` (empty = grand
    total) and estimate the distinct count — touches only sketch rows.

    Mixed lg_k inputs are refused by default (the union would silently
    coarsen to the lowest config); pass ``allow_different_lg_k=True``
    to accept the degraded accuracy explicitly. The guard is a plan-
    side aggregate over the (tiny) sketch relation, not a collect of
    sketches.
    """
    if "lg_k" in sketches.columns and not allow_different_lg_k:
        ks = sketches.agg(
            F.countDistinct("lg_k").alias("n"),
            F.min("lg_k").alias("lo"),
            F.max("lg_k").alias("hi"),
        ).collect()[0]
        if ks["n"] > 1:
            raise ValueError(
                f"sketches span lg_k [{ks['lo']}, {ks['hi']}]; merging "
                "mixed configs degrades to the coarsest — pass "
                "allow_different_lg_k=True to accept"
            )
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    merged = gb.agg(
        F.hll_union_agg(SKETCH_COL, F.lit(allow_different_lg_k)).alias(
            SKETCH_COL
        )
    )
    return merged.select(
        *group_cols,
        SKETCH_COL,
        F.hll_sketch_estimate(SKETCH_COL).alias(estimate_col),
    )


def estimate(sketch: Column | str) -> Column:
    """Point estimate for a single sketch column."""
    return F.hll_sketch_estimate(sketch)


def streaming_sketch_maintenance(stream_df: DataFrame, path: str,
                                 bucket_cols: list[str], value_col: str,
                                 lg_k: int = DEFAULT_LG_K,
                                 checkpoint: str | None = None):
    """Maintain a persisted sketch table from a stream: each
    micro-batch appends its own bucket sketches (one tiny row per
    touched bucket). foreachBatch is at-least-once, but here a PLAIN
    append is already correct: the union is register-wise max, so a
    replayed batch's duplicate sketch rows leave every rollup estimate
    unchanged (pinned in tests/test_sketches.py) — idempotence comes
    from the algebra, not from sink machinery. The exactly-once sink
    (streaming/exactly_once.py) remains the tool for payloads whose
    duplication DOES corrupt; for sketches the only cost of replay is
    storage, which compact_sketches reclaims.

    Returns the started StreamingQuery.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # self-heal a half-done compaction swap BEFORE appending: an
        # append that recreates a missing live dir would strand the
        # real history under the swap's .old name (operators/fswap.py)
        from .fswap import recover_directory

        recover_directory(batch_df.sparkSession, path)
        build_distinct_sketches(
            batch_df, bucket_cols, value_col, lg_k
        ).write.mode("append").parquet(path)

    writer = stream_df.writeStream.foreachBatch(_process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def compact_sketches(spark, path: str) -> None:
    """Fold accumulated per-batch sketch rows back to one row per
    bucket — pure storage hygiene: associativity + idempotence mean
    every rollup estimate is unchanged by compaction. Writes the
    compacted table beside the original and promotes it with the
    crash-safe three-step swap (operators/fswap.py): every
    intermediate state keeps a complete dataset under a known name,
    and a crashed swap self-heals on the next maintenance/compaction
    call — no delete-then-rename no-live-data window. On S3-class
    stores the renames are copy-based — run inside the store's commit
    mechanism there."""
    from .fswap import TMP_SUFFIX, promote_directory, recover_directory

    recover_directory(spark, path)  # finish any half-done prior swap
    df = spark.read.parquet(path)
    bucket_cols = [c for c in df.columns if c not in (SKETCH_COL, "lg_k")]
    merged = df.groupBy(*bucket_cols).agg(
        F.hll_union_agg(SKETCH_COL, F.lit(False)).alias(SKETCH_COL),
        F.min("lg_k").alias("lg_k"),
    ).select(*bucket_cols, SKETCH_COL, "lg_k")
    tmp = path.rstrip("/") + TMP_SUFFIX
    merged.write.mode("overwrite").parquet(tmp)
    promote_directory(spark, path, tmp)


def intersect_distinct_estimate(sketches_a: DataFrame,
                                sketches_b: DataFrame) -> DataFrame:
    """Estimated distinct count of the INTERSECTION of two sketch
    sets' value populations (e.g. "users active in BOTH ranges") via
    inclusion-exclusion: |A ∩ B| = |A| + |B| - |A ∪ B|, each term an
    HLL estimate — the union term merges the two sketch sets directly,
    so the raw rows are never revisited.

    Honesty note: each term carries the sketch's relative error on ITS
    OWN magnitude, so the absolute error of the difference is governed
    by the LARGER of |A| and |B| — when the true intersection is small
    relative to either side, the relative error blows up and the
    estimate can even go negative (clamped to 0 here). Use it for
    overlap dashboards at comparable magnitudes; for guaranteed-small
    intersections compute exactly over the raw rows instead. Returns a
    1-row DataFrame (n_a, n_b, n_union, n_intersect_est).
    """
    a = rollup_distinct(sketches_a, [], estimate_col="n_a").select(
        F.col(SKETCH_COL).alias("__sa"), "n_a"
    )
    b = rollup_distinct(sketches_b, [], estimate_col="n_b").select(
        F.col(SKETCH_COL).alias("__sb"), "n_b"
    )
    return (
        a.crossJoin(b)
        .select(
            "n_a",
            "n_b",
            F.hll_sketch_estimate(
                F.hll_union("__sa", "__sb", False)
            ).alias("n_union"),
        )
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.greatest(
                F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0)
            ).alias("n_intersect_est"),
        )
    )
