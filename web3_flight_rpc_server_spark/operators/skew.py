"""Skew mitigation: salted two-phase aggregation.

A groupBy on a key where one value holds a large share of all rows
(the hot contract, the null user) funnels that key's entire volume
into ONE reduce task — the stage runs at the speed of the straggler.
AQE's skew-join splitting covers joins; for AGGREGATIONS whose
per-key state is mergeable, salting generalizes: phase 1 aggregates
(key, salt) with salt = hash(row) % n_salts (hot key split n ways),
phase 2 merges the n partials per key. Two small shuffles instead of
one stuck task.

Only algebraic (mergeable) aggregates qualify: count/sum/min/max/
approximate sketches merge; exact distinct or median do not (those
need count-distinct expansion or sketches instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str], n_salts: int = 32,
               counts: list[str] | None = None,
               sums: list[str] | None = None,
               mins: list[str] | None = None,
               maxs: list[str] | None = None) -> DataFrame:
    """Two-phase salted aggregate. Output columns: key_cols +
    n_rows (if counts is not None... always) + sum_<c>/min_<c>/max_<c>.

    Equivalent to df.groupBy(key_cols).agg(count, sum, min, max) for
    any data; strictly better when a key is hot."""
    sums = sums or []
    mins = mins or []
    maxs = maxs or []
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))

    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sums],
            *[F.min(c).alias(f"__min_{c}") for c in mins],
            *[F.max(c).alias(f"__max_{c}") for c in maxs],
        )
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums],
        *[F.min(f"__min_{c}").alias(f"min_{c}") for c in mins],
        *[F.max(f"__max_{c}").alias(f"max_{c}") for c in maxs],
    )
