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
