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


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """pd.merge_asof-based variant via cogrouped applyInPandas
    (C18 UDF-surface breadth): both sides are cogrouped by key, each
    key's pair of pandas frames merged as-of in Python.

    Same single-shuffle cost shape as the window version (hash both
    sides by key), but leaves the JVM — use the window version in the
    hot path; this one exists for semantics Python can express more
    directly (nearest-tolerance joins, backward/forward switching)
    and as the equivalence oracle for the window implementation."""
    import pandas as pd

    from pyspark.sql import types as T

    left_cols = list(left.columns)
    out_fields = [left.schema[c] for c in left_cols]
    payload_cols = [right_ts] + [c for c in right_payload if c != right_ts]
    for c in payload_cols:
        f = right.schema[c]
        out_fields.append(type(f)(f"{c}{suffix}", f.dataType, True))
    out_schema = T.StructType(out_fields)

    # Pre-project the right side to UNIQUE column names before the
    # cogroup: when both sides derive from the same base DataFrame
    # (self-cogroup), attribute dedup mis-prunes the right side down
    # to the grouping key — the pandas function then receives a frame
    # with only [on]. Distinct names force the pruner to keep them.
    suffixed = [f"{c}{suffix}" for c in payload_cols]
    right_proj = right.select(
        F.col(on), *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        if rpdf.empty:
            for c in suffixed:
                lpdf[c] = None
            return lpdf[list(out_schema.names)]
        rsel = rpdf[suffixed].sort_values(f"{right_ts}{suffix}")
        merged = pd.merge_asof(
            lpdf, rsel,
            left_on=left_ts, right_on=f"{right_ts}{suffix}",
            direction="backward", allow_exact_matches=True,
        )
        return merged[list(out_schema.names)]

    return (
        left.groupBy(on)
        .cogroup(right_proj.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )
