"""Mergeable heavy-hitter summaries (§2C9 depth — the frequent-items
member of the summary-serving trio: HLL distinct
(operators/sketches.py), quantile histograms
(operators/histograms.py), and this).

"Which items dominate?" — hot keys, boilerplate n-grams, top users —
is the third dashboard question that must not rescan 100 TB per ask.
The mergeable summary here is per-bucket exact top-K with an explicit
error bound, the distributed form of Misra-Gries/space-saving: each
bucket keeps its K most frequent items (exact within-bucket counts)
plus ``err_bound`` = the largest count it DROPPED. Merging buckets
sums observed counts, and the bound algebra stays honest:

    lb(item) = sum of counts where the item made the bucket's top-K
    ub(item) = lb + sum of err_bound over buckets it MISSED

so lb <= true_count <= ub always (an item absent from a bucket's
summary had count <= that bucket's err_bound there). Consequently any
item whose true merged count exceeds the merged groups' total error
is GUARANTEED to surface, and ``guaranteed`` (lb >= threshold) never
false-positives. Buckets that drop nothing (K >= bucket cardinality)
have err_bound 0 and the merge is exact — the cross-engine check in
queries/aggregates.py:q_heavy_hitters runs that regime; the truncated
regime's bound correctness is pinned in tests/test_heavy_hitters.py.

All built-in expressions: one (bucket, item) count shuffle, then a
per-bucket window sort of the counted items — distributed across
buckets, the standard exact-top-K shape (the sort is over the COUNTED
table, items x buckets, already far smaller than the raw rows). With
``bucket_cols=[]`` the window degenerates to a single partition: fine
for per-micro-batch summaries (the epochs-as-buckets pattern in
tests/test_heavy_hitters.py), but for a one-shot GLOBAL top-K over a
huge item space use an orderBy().limit() TakeOrdered instead
(operators/vocab.py:build_vocabulary is that shape). The merge
aggregates item rows — per-key state is O(1), no arrays of unbounded
length anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_topk_summaries(df: DataFrame, bucket_cols: list[str],
                         item_col: str, k: int = 100) -> DataFrame:
    """Per bucket: the K most frequent ``item_col`` values with exact
    within-bucket counts, plus the bucket's ``err_bound`` (largest
    dropped count; 0 when nothing was dropped). Output: bucket_cols +
    (item, n, err_bound) rows, <= K per bucket."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(*bucket_cols, item_col)
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(*bucket_cols).orderBy(
        F.desc("n"), F.asc(item_col)
    )
    ranked = counts.withColumn("__rk", F.row_number().over(w))
    dropped_rows = ranked.where(F.col("__rk") > k)
    errs = (
        dropped_rows.groupBy(*bucket_cols)
        if bucket_cols
        else dropped_rows.groupBy()
    ).agg(F.max("n").alias("err_bound"))
    kept = ranked.where(F.col("__rk") <= k).drop("__rk")
    out = (
        kept.join(errs, bucket_cols, "left")
        if bucket_cols
        else kept.crossJoin(F.broadcast(errs))
    )
    return out.select(
        *bucket_cols,
        F.col(item_col).alias("item"),
        "n",
        F.coalesce(F.col("err_bound"), F.lit(0).cast("long")).alias(
            "err_bound"
        ),
    )


def merge_topk(summaries: DataFrame, group_cols: list[str],
               bucket_cols: list[str]) -> DataFrame:
    """Merge bucket summaries up to ``group_cols`` (a prefix/subset of
    the build's bucket columns; empty = grand total). Output one row
    per (group, item): ``lb`` / ``ub`` bounds on the true merged count
    and the group's ``total_err`` (sum of its buckets' err_bounds —
    every item with true count above it is guaranteed present).
    """
    # one err_bound per bucket (it is replicated on each item row)
    bucket_errs = summaries.select(*bucket_cols, "err_bound").distinct()
    gb = lambda df, cols: df.groupBy(*cols) if cols else df.groupBy()  # noqa: E731
    total_err = gb(bucket_errs, group_cols).agg(
        F.sum("err_bound").alias("total_err")
    )
    per_item = gb(summaries, [*group_cols, "item"]).agg(
        F.sum("n").alias("lb"),
        F.sum("err_bound").alias("__present_err"),
    )
    joined = (
        per_item.join(total_err, group_cols)
        if group_cols
        else per_item.crossJoin(F.broadcast(total_err))
    )
    return joined.select(
        *group_cols,
        "item",
        "lb",
        (F.col("lb") + F.col("total_err") - F.col("__present_err")).alias(
            "ub"
        ),
        "total_err",
    )


def guaranteed_above(merged: DataFrame, threshold: int) -> DataFrame:
    """Items PROVEN to exceed ``threshold`` (lb >= threshold) — no
    false positives by construction. The complement query (possible
    hitters, ub >= threshold) has no false negatives; the gap between
    the two is the summary's honesty interval."""
    return merged.where(F.col("lb") >= threshold)
