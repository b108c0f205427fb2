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
