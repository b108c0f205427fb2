"""Mergeable quantile histograms (§2C9 depth — the percentile
counterpart of operators/sketches.py's HLL rollup).

`percentile_approx` answers one query over one scan; a serving layer
wants percentiles over ARBITRARY ranges/groups without rescanning raw
rows. Fixed-bin histograms are the classic mergeable summary for that:
one raw pass counts values into `bins` equal-width bins per bucket
(e.g. per day x event_type), and because bin counts are EXACT
integers, merging buckets is element-wise addition — an exact
re-aggregation, stronger than the HLL union (which is exact only in
its register space). Any percentile over any merged range is then read
off the cumulative distribution with error bounded by one bin width.

Everything is built-in expressions. The merge deliberately explodes to
(bin, count) rows and sums per bin rather than folding whole arrays in
an aggregate buffer: rows after explode = buckets x bins (tiny), and
per-key aggregation state stays O(1) — a collect_list-of-arrays merge
would buffer every input histogram per group, the same unbounded-state
shape the curation ledger removed in round 3.

Out-of-range values land in explicit below/above overflow counts, not
silently in edge bins: at 100 TB the value distribution drifts after
the bounds are chosen, and overflow counts are both the drift monitor
and the signal to re-bin. Bounds should come from a profiling pass
(operators/profile.py) or percentile clamps (the sources/zorder.py
lever) — not guessed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COUNTS_COL = "__bin_counts"


def _meta_cols() -> list[str]:
    return ["lo", "hi", "bins", "n_below", "n_above"]


def build_histograms(df: DataFrame, bucket_cols: list[str],
                     value_col: str, lo: float, hi: float,
                     bins: int = 128) -> DataFrame:
    """One histogram row per bucket: ``bucket_cols`` + exact bin
    counts (``array<bigint>`` of length ``bins`` over [lo, hi)), the
    binning config, and below/above overflow counts. Null values are
    ignored (they carry no quantile information).

    One hash shuffle on (bucket, bin); the dense array is assembled
    from at most ``bins`` rows per bucket — bounded aggregation state.
    """
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value_col)
    width = (hi - lo) / bins
    bin_expr = (
        F.when(v.isNull(), F.lit(None))
        .when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    )
    per_bin = (
        df.select(*bucket_cols, bin_expr.alias("__bin"))
        .where(F.col("__bin").isNotNull())
        .groupBy(*bucket_cols, "__bin")
        .agg(F.count("*").alias("__c"))
    )
    # dense array assembly: <= bins+2 (bin, count) pairs per bucket
    pairs = F.map_from_entries(
        F.collect_list(F.struct(F.col("__bin"), F.col("__c")))
    )
    assembled = per_bin.groupBy(*bucket_cols).agg(pairs.alias("__m"))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return assembled.select(
        *bucket_cols,
        counts.alias(COUNTS_COL),
        F.lit(float(lo)).alias("lo"),
        F.lit(float(hi)).alias("hi"),
        F.lit(bins).alias("bins"),
        F.coalesce(F.element_at(F.col("__m"), -1), F.lit(0).cast("long")).alias(
            "n_below"
        ),
        F.coalesce(
            F.element_at(F.col("__m"), F.lit(bins).cast("int")),
            F.lit(0).cast("long"),
        ).alias("n_above"),
    )


def merge_histograms(hists: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge bucket histograms up to ``group_cols`` (empty = grand
    total) — element-wise exact addition, so staged partial merges are
    exact re-aggregations. Mixed binning configs are refused: adding
    counts across different (lo, hi, bins) is meaningless.
    """
    cfg = hists.agg(
        F.countDistinct("lo", "hi", "bins").alias("n")
    ).collect()[0]
    if cfg["n"] > 1:
        raise ValueError(
            "histograms carry mixed (lo, hi, bins) configs; re-bin "
            "before merging — element-wise addition across different "
            "bin edges is meaningless"
        )
    exploded = hists.select(
        *group_cols,
        "lo",
        "hi",
        "bins",
        "n_below",
        "n_above",
        F.posexplode(COUNTS_COL).alias("__bin", "__c"),
    )
    per_bin = exploded.groupBy(*group_cols, "lo", "hi", "bins", "__bin").agg(
        F.sum("__c").alias("__c"),
        # each bucket contributes exactly one row per bin group, so the
        # per-bin sum of overflow counts IS the group total; the
        # cross-bin replication is collapsed by the first() below, not
        # by division (a bucket whose rows are ALL overflow still has a
        # full-length zero counts array, so no bucket escapes the sum)
        F.sum("n_below").alias("__nb"),
        F.sum("n_above").alias("__na"),
    )
    pairs = F.map_from_entries(
        F.collect_list(F.struct(F.col("__bin"), F.col("__c")))
    )
    assembled = per_bin.groupBy(*group_cols, "lo", "hi", "bins").agg(
        pairs.alias("__m"),
        F.first("__nb").alias("n_below"),
        F.first("__na").alias("n_above"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.col("bins") - 1),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return assembled.select(
        *group_cols,
        counts.alias(COUNTS_COL),
        "lo",
        "hi",
        "bins",
        "n_below",
        "n_above",
    )


def percentile_estimate(q: float) -> Column:
    """Estimate the q-quantile from a histogram row's columns —
    linear interpolation within the containing bin. Usable in a select
    over build_histograms/merge_histograms output.

    Definition and bound: this inverts the CDF at mass q*n (the
    inverse-CDF / "type 1" quantile), so the estimate provably lands
    within one bin width of the ceil(q*n)-th order statistic — that
    order statistic sits inside the selected bin (pinned as a
    hypothesis property in tests/test_properties.py). Against the
    INTERPOLATED definition (SQL percentile / numpy type 7) add one
    rank of slack: negligible at any real n, but at toy n a rank can
    span an arbitrary value gap, so cross-checks against interpolated
    percentiles (q_hist_quantile) are meaningful only when bins are
    dense relative to the data's jumps."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    counts = F.col(COUNTS_COL)
    total = F.aggregate(counts, F.lit(0).cast("long"), lambda a, c: a + c)
    target = F.lit(q) * total.cast("double")
    width = (F.col("hi") - F.col("lo")) / F.col("bins")
    # cumulative counts; first index whose cumsum reaches the target
    cum = F.transform(
        F.sequence(F.lit(1), F.col("bins")),
        lambda i: F.aggregate(
            F.slice(counts, 1, i.cast("int")),
            F.lit(0).cast("long"),
            lambda a, c: a + c,
        ),
    )
    idx = F.array_position(
        F.transform(cum, lambda c: c.cast("double") >= target), F.lit(True)
    )
    cum_before = F.when(idx > 1, F.element_at(cum, (idx - 1).cast("int"))).otherwise(
        F.lit(0)
    )
    in_bin = F.element_at(counts, idx.cast("int"))
    frac = F.when(
        in_bin > 0, (target - cum_before.cast("double")) / in_bin.cast("double")
    ).otherwise(F.lit(0.0))
    return F.when(total > 0, F.col("lo") + width * ((idx - 1).cast("double") + frac))


def streaming_histogram_maintenance(stream_df: DataFrame, out_dir: str,
                                    bucket_cols: list[str], value_col: str,
                                    lo: float, hi: float, bins: int = 128,
                                    checkpoint: str | None = None):
    """Maintain persisted histograms from a stream. Unlike the HLL
    sketches (whose register-max union makes replayed rows harmless,
    operators/sketches.py), histogram counts are ADDITIVE — a replayed
    micro-batch would double-count — so this maintenance rides the
    epoch-manifest exactly-once sink (streaming/exactly_once.py):
    each epoch's bucket histograms land under their batch id, replays
    are dropped whole, and the serving read
    (read_merged_histograms) resolves committed epochs only. The same
    division of labor applies to any count-based summary, e.g. the
    heavy-hitter summaries. Returns the started StreamingQuery.
    """
    from ..streaming.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(
        out_dir,
        transform=lambda df: build_histograms(
            df, bucket_cols, value_col, lo, hi, bins
        ),
    )
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_merged_histograms(spark, out_dir: str,
                           group_cols: list[str]) -> DataFrame:
    """Serve from the maintained table: merge committed epochs' bucket
    histograms up to ``group_cols`` — per-epoch partials of the same
    bucket fold exactly by additivity."""
    from ..streaming.exactly_once import read_committed

    return merge_histograms(
        read_committed(spark, out_dir).drop("epoch"), group_cols
    )


def histogram_distance(a: DataFrame, b: DataFrame,
                       join_cols: list[str]) -> DataFrame:
    """Distribution drift between two histogram tables (same binning
    config, e.g. last week's vs this week's build): per joined bucket,
    the L1 (total-variation x2) distance between the NORMALIZED bin
    distributions plus both sides' totals — the "did the value
    distribution move" monitor that pairs with profile_drift's
    null/cardinality flags and the per-build overflow counts.

    Pure zip_with arithmetic over the two count arrays after an
    equi-join on ``join_cols`` — histograms are tiny, so the join
    broadcasts; raw rows are never touched. Buckets missing on either
    side report a null distance (no basis for comparison), and a side
    with zero in-range rows likewise."""
    cfg = (
        a.select("lo", "hi", "bins")
        .unionByName(b.select("lo", "hi", "bins"))
        .distinct()
        .count()
    )
    if cfg > 1:
        raise ValueError(
            "histogram configs differ between the two sides; rebuild "
            "with one (lo, hi, bins) before comparing"
        )
    left = a.select(
        *join_cols, F.col(COUNTS_COL).alias("__ca")
    )
    right = b.select(
        *join_cols, F.col(COUNTS_COL).alias("__cb")
    )
    j = (
        left.join(F.broadcast(right), join_cols, "full_outer")
        if join_cols
        # group-less comparison: both sides are a single global
        # histogram row — a cross of two 1-row relations
        else left.crossJoin(F.broadcast(right))
    )
    ta = F.aggregate(F.col("__ca"), F.lit(0).cast("long"), lambda x, c: x + c)
    tb = F.aggregate(F.col("__cb"), F.lit(0).cast("long"), lambda x, c: x + c)
    l1 = F.aggregate(
        F.zip_with(
            F.col("__ca"),
            F.col("__cb"),
            lambda ca, cb: F.abs(
                ca.cast("double") / ta - cb.cast("double") / tb
            ),
        ),
        F.lit(0.0),
        lambda x, d: x + d,
    )
    defined = (
        F.col("__ca").isNotNull()
        & F.col("__cb").isNotNull()
        & (ta > 0)
        & (tb > 0)
    )
    return j.select(
        *join_cols,
        ta.alias("n_a"),
        tb.alias("n_b"),
        F.when(defined, l1).alias("l1_distance"),
        F.when(defined, l1 / 2).alias("total_variation"),
    )
