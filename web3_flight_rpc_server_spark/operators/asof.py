"""As-of join — an operator Spark lacks natively (SURVEY.md C2).

Semantics: for each left row, attach the single right row with the
largest ``right_ts <= left_ts`` within the same key group (the classic
"latest quote at trade time" join; DuckDB spells it ASOF JOIN).

Implementation: union the two sides with a side tag, then one window
pass per key ordered by (ts, side) carrying the last-seen right payload
forward — ``last(payload, ignorenulls=True)`` over
``rowsBetween(unboundedPreceding, currentRow)``. Right rows sort before
left rows at equal ts so ``>=`` matches inclusively.

Scale notes: this costs exactly ONE shuffle (hash by key, sort by ts
within partitions) — the same cost as any sort-merge join on the key,
and strictly cheaper than the naive inequality join (which Catalyst
can only plan as a broadcast-nested-loop). Skewed keys degrade the
window sort; salt by time-bucket if one key dominates. The
applyInPandas + pd.merge_asof alternative has the same shuffle shape
but leaves the JVM; this version stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Right payload columns come back suffixed (``<col><suffix>``), null
    when no right row precedes the left row (left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload_cols = [right_ts] + [c for c in right_payload if c != right_ts]

    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),  # right sorts first at equal ts => inclusive <=
        F.struct(*payload_cols).alias(_PAYLOAD),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    unioned = l.select(r.columns + [c for c in l.columns if c not in r.columns]) \
        .unionByName(r, allowMissingColumns=True)

    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = matched.where(F.col(_SIDE) == 1)
    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_PAYLOAD, _SIDE, _TS)
