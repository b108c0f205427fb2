"""One-pass table profiling: per-column health stats for source
monitoring (the ingest-side complement of queries/text.py's per-doc
quality gates — before curating documents, a 100 TB pipeline first
asks whether the SOURCE is healthy: null spikes, cardinality drift,
range drift).

Everything is computed in ONE scan: a single global aggregate holds
every column's counters side by side (count/nulls/distinct/min/max are
all partial-aggregatable, so the pass is map-side combined and ships
one row per task), then the wide row is unpivoted driver-free with
``stack``. No per-column scans, no collect — profiling a 100 TB table
costs exactly one read of it.

Distinct counts default to HyperLogLog++ (`approx_count_distinct`):
N exact `countDistinct`s in one aggregate force an Expand (N rows per
input row — a 6x row multiplier for a 6-column table) while N approx
sketches coexist in one pass. ``exact_distinct=True`` keeps the exact
semantics for small/fixture tables and the DuckDB oracle
(queries/aggregates.py:q_profile); the plan-shape difference is pinned
in tests/test_profile.py.

The reference has no profiling surface; its notebook eyeballs
`df.describe()` on collected pandas frames (notebook cells 8/14) —
this is that idea made distributed and single-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact_distinct: bool = False,
                  rsd: float = 0.02) -> DataFrame:
    """One row per column: ``(column, dtype, n_rows, n_nulls,
    null_frac, n_distinct, min_value, max_value)``.

    min/max are computed on the native type (so numeric/timestamp
    ordering is correct) and cast to string afterwards for a uniform
    output schema.
    """
    cols = df.columns
    if not cols:
        raise ValueError("cannot profile a zero-column DataFrame")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"__nulls_{i}")
        )
        aggs.append(
            (
                F.countDistinct(col)
                if exact_distinct
                else F.approx_count_distinct(col, rsd=rsd)
            ).alias(f"__distinct_{i}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', __nulls_{i}, __distinct_{i}, "
        f"__min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, dtype, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "dtype",
        "n_rows",
        "n_nulls",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def profile_drift(old: DataFrame, new: DataFrame,
                  null_frac_abs: float = 0.05,
                  distinct_rel: float = 0.5) -> DataFrame:
    """Diff two profile snapshots (profile_table outputs) into a
    per-column drift report — the alerting half of source-health
    monitoring: a scrape-format change shows up as a null spike or a
    cardinality cliff in the NEXT snapshot, long before it poisons
    dedup or training mixes downstream.

    Flags per column: ``added``/``dropped`` (schema drift),
    ``type_changed``, ``null_spike`` (null_frac moved more than
    ``null_frac_abs`` absolutely), ``cardinality_shift`` (distinct
    count changed more than ``distinct_rel`` relatively). A full outer
    join of two tiny profile tables — the comparison never touches the
    profiled data itself.
    """
    o = old.select(
        F.col("column"),
        F.col("dtype").alias("old_dtype"),
        F.col("null_frac").alias("old_null_frac"),
        F.col("n_distinct").alias("old_n_distinct"),
    )
    n = new.select(
        F.col("column"),
        F.col("dtype").alias("new_dtype"),
        F.col("null_frac").alias("new_null_frac"),
        F.col("n_distinct").alias("new_n_distinct"),
    )
    j = o.join(n, "column", "full_outer")
    flags = F.array_compact(
        F.array(
            F.when(F.col("old_dtype").isNull(), F.lit("added")),
            F.when(F.col("new_dtype").isNull(), F.lit("dropped")),
            F.when(
                F.col("old_dtype").isNotNull()
                & F.col("new_dtype").isNotNull()
                & (F.col("old_dtype") != F.col("new_dtype")),
                F.lit("type_changed"),
            ),
            F.when(
                F.abs(
                    F.col("new_null_frac") - F.col("old_null_frac")
                ) > null_frac_abs,
                F.lit("null_spike"),
            ),
            F.when(
                F.abs(F.col("new_n_distinct") - F.col("old_n_distinct"))
                > distinct_rel * F.greatest(F.col("old_n_distinct"), F.lit(1)),
                F.lit("cardinality_shift"),
            ),
        )
    )
    return j.select(
        "column",
        "old_dtype",
        "new_dtype",
        "old_null_frac",
        "new_null_frac",
        "old_n_distinct",
        "new_n_distinct",
        flags.alias("flags"),
        (F.size(flags) > 0).alias("drifted"),
    )
