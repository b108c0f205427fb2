"""UDF-surface queries (C18) + pivot (B-adjacent reshaping).

The reference's only scalar transform is the hex-quantity decode
(Converter.java:322-336). q_pandas_udf_hexdecode runs that decode
through the Arrow-vectorized Pandas-UDF path — the sanctioned slow
path for logic built-ins can't express — and its oracle states the
round-trip identity (decode(hex(x)) == x), so the driver cross-checks
the UDF's arithmetic, not just its plumbing.

Scale notes: a scalar pandas_udf processes Arrow batches (10k rows
per batch by default) — the per-row pickle tax of classic UDFs is
absent, but it still leaves the JVM; q_scan_project's conv()-based
decode is the hot-path version. Pivot with explicit values avoids the
extra distinct-scan Spark otherwise runs to discover columns.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..sources import tables

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _hex_decode_pd():
    """Vectorized Numeric.decodeQuantity: 0x-prefixed hex -> int64,
    None passthrough (Converter.java:322-328 null semantics). Built
    lazily — pandas_udf needs an active session to parse its type."""

    @pandas_udf("long")
    def decode(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else int(v, 16), na_action="ignore")

    return decode


@query(
    "q_pandas_udf_hexdecode",
    oracle="""
    SELECT event_id, event_id AS decoded
    FROM events
    """,
)
def q_pandas_udf_hexdecode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-encode event_id JVM-side, decode it back through an
    Arrow-batched pandas UDF; the oracle asserts the identity."""
    ev = tables.load_table(spark, sf_dir, "events")
    hexed = ev.select(
        "event_id", F.concat(F.lit("0x"), F.lower(F.hex("event_id"))).alias("h")
    )
    return hexed.select("event_id", _hex_decode_pd()("h").alias("decoded"))


@query(
    "q_pivot",
    declared=False,
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts to one column per type (explicit value list:
    single pass, no discovery scan; absent combinations -> 0).
    Undeclared since r10 (ceded its slot to q_curation_semantic; C18
    stays driver-attested by q_pandas_udf_hexdecode, and the pivot
    remains oracle-checked by tests/test_oracle_parity.py's
    whole-registry parametrize)."""
    ev = tables.load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
        .na.fill(0)
    )
    return pivoted.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )


def geometric_mean_udaf():
    """Grouped-aggregate pandas UDAF (C18's UDAF leg): geometric mean
    of a double column per group. Arrow ships each group's values as
    one pandas Series; Spark handles the groupBy shuffle, so the
    Python cost is one vectorized numpy pass per group. Library
    function (pytest-verified, not a registry slot — the UDF driver
    slot belongs to q_pandas_udf_hexdecode)."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        x = v.dropna().to_numpy(dtype="float64")
        x = x[x > 0]
        if not len(x):
            return float("nan")
        return float(np.exp(np.log(x).mean()))

    return geo_mean


def make_props_udtf():
    """Python UDTF (C18's UDTF leg, Spark 4 ``@udtf``): explode a JSON
    props string into (key, value) rows — the lateral-view shape for
    schemaless payload columns. Built lazily (the decorator needs an
    active session); callers register it with
    ``spark.udtf.register("props_kv", make_props_udtf())`` and use it
    in SQL as ``LATERAL props_kv(props)``."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value string")
    class PropsKV:
        def eval(self, props: str):
            if props is None:
                return
            try:
                obj = json.loads(props)
            except ValueError:
                return
            if isinstance(obj, dict):
                for k in sorted(obj):
                    yield str(k), str(obj[k])

    return PropsKV
