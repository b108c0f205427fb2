"""Z-order (Morton curve) clustered layout — multi-column data
skipping (C27 storage lever).

Linear sort clusters ONE column: parquet row-group min/max stats get
tight on the sort key and useless on everything else. Interleaving
the bits of several scaled columns (the Morton / Z space-filling
curve) and range-partitioning + sorting on that value gives every
file a contiguous z-range — a small axis-aligned BOX in the original
column space — so min/max stats are tight on ALL the z-ordered
columns at once and a multi-dimension box predicate prunes row groups
in every dimension. This is the technique behind Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's z-ordered rewrites, expressed here
with nothing but built-in Spark expressions and a plain parquet
write.

The engine-relevant workload: logs filtered by block range AND
address (the reference can only scope by block range,
LogsService.java:548-556, and re-filters addresses row by row); a
(blockNumber, address-hash) z-order makes both predicates prune IO.

Scale notes: the column scaling clamps to the approximate 0.1/99.9
percentiles (one tiny approx_percentile aggregate) instead of raw
min/max — a single extreme outlier would otherwise collapse the
effective bit range for the whole column and degrade skipping to a
near-scan; values outside the clamp saturate to the curve's edge
cells, which costs nothing (they cluster into the edge files). Ranks
would resist skew even better but cost a full sort. The z value is
transient (dropped before write); re-clustering is a rewrite, exactly
like OPTIMIZE. Stats collection + repartitionByRange's sampling are
the only extra cost over a plain sorted write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _scaled(c: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Map a numeric column to an integer in [0, 2^bits) by min/max
    scaling (constant-degenerate columns map to 0)."""
    span = cmax - cmin
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (c.cast("double") - F.lit(float(cmin)))
        / F.lit(float(span))
        * F.lit(float(2 ** bits))
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(2 ** bits - 1))


def zorder_value(scaled_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of the scaled columns into one
    Morton value: output bit (b * k + i) = bit b of column i.

    bits * len(cols) must stay under 64: Spark's shiftleft masks the
    shift amount mod 64, so an overflowing position would silently
    wrap onto low bits and scramble the curve — refused here instead."""
    k = len(scaled_cols)
    if bits * k > 63:
        raise ValueError(
            f"bits*cols = {bits * k} exceeds 63 — interleaved positions "
            "past bit 63 wrap (shiftleft masks mod 64); lower bits "
            f"(e.g. {63 // k}) or z-order fewer columns"
        )
    terms = [
        F.shiftleft(
            F.shiftright(col, b).bitwiseAND(F.lit(1)), b * k + i
        ).cast("long")
        for b in range(bits)
        for i, col in enumerate(scaled_cols)
    ]
    return reduce(lambda a, t: a + t, terms, F.lit(0).cast("long"))


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = DEFAULT_BITS, files: int = 32) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    one global min/max aggregate for scaling, then
    repartitionByRange + sortWithinPartitions on the (transient) z
    value so each of the ``files`` output files covers a contiguous
    z-range — an axis-aligned box in the original columns."""
    bits = min(bits, 63 // max(len(cols), 1))
    # percentile-clamped scaling bounds: one planted outlier (a bad
    # sensor value, an overflowed counter) must not stretch the scale
    # so far that the real data collapses into a handful of cells
    stats = df.agg(
        *[
            F.approx_percentile(F.col(c).cast("double"), F.lit(0.001))
            .alias(f"mn_{c}")
            for c in cols
        ],
        *[
            F.approx_percentile(F.col(c).cast("double"), F.lit(0.999))
            .alias(f"mx_{c}")
            for c in cols
        ],
    ).first()
    if any(stats[f"mn_{c}"] is None for c in cols):
        # empty input (or all-null cluster columns): nothing to
        # cluster — write the empty/plain frame rather than crash a
        # scheduled re-clustering job on a benign empty partition
        df.write.mode("overwrite").parquet(path)
        return
    scaled = [
        _scaled(F.col(c), float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"]), bits)
        for c in cols
    ]
    z = zorder_value(scaled, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
