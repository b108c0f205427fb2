"""Runtime bloom-filter join pruning (semi-join reduction) — the
shuffle-join lever that broadcast cannot cover.

At 100 TB a selective dim-side predicate (e.g. ``orders`` filtered to
one priority) joined to an unfiltered fact (``lineitem``) still
shuffles the WHOLE fact side first if the dim is too big to broadcast:
the fact rows that will never match are hashed, serialized, shipped,
and only then dropped by the join. Catalyst's runtime filters
(``InjectRuntimeFilter``) fix this by building a bloom filter over the
dim side's join keys as a subquery and pushing a ``might_contain``
probe into the fact SCAN — non-matching fact rows die before the
exchange, turning an O(fact) shuffle into an O(matching-fact) one.
This is the planner-native analog of the reference's source-side
filter pushdown (LogsService.java:548-556): there the upstream RPC
drops rows before the wire; here the bloom probe drops them before
the shuffle.

Spark injects these automatically when

- the join is a shuffle join (a broadcastable dim is already handled
  better by broadcast + AQE's ``DynamicJoinSelection``),
- the creation side is small post-filter
  (``runtime.bloomFilter.creationSideThreshold``, default 10 MB), and
- the application side is big enough to be worth it
  (``runtime.bloomFilter.applicationSideScanSizeThreshold``, default
  10 GB).

The thresholds are sized for real warehouses, so a local[32] test
corpus never triggers injection with defaults — ``demo_confs`` scales
them down the same way tests drop ``autoBroadcastJoinThreshold`` to
force shuffle plans. Production keeps the defaults: the feature is on
by default in Spark 3.4+ and needs no code changes, which is exactly
the point — declare the join, let the optimizer place the filter.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# Runtime-settable confs that make bloom-filter injection observable
# on a small local corpus. Keys are the public Spark SQL confs.
DEMO_CONFS: dict[str, str] = {
    # Force the dim join out of broadcast range so a shuffle join is
    # planned (the injection precondition).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # Default 10 GB — far above any local fixture; any scan qualifies.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Default 10 MB — fine locally, set explicitly for determinism.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


@contextmanager
def demo_confs(spark: SparkSession) -> Iterator[None]:
    """Temporarily apply DEMO_CONFS, restoring prior values after."""
    old: dict[str, str | None] = {}
    for k, v in DEMO_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def selective_fact_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                        dim_key: str) -> DataFrame:
    """Plain declarative equi-join — deliberately nothing else. The
    bloom filter is the OPTIMIZER's job; encoding it by hand (manual
    semi-join, collected key list) would defeat AQE and cost-based
    placement. Callers assert injection via the plan, not the API."""
    return fact.join(dim, fact.__getattr__(fact_key) == dim.__getattr__(dim_key))


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True iff the optimized plan probes a bloom filter in a scan
    (``might_contain`` over a ``bloom_filter_agg`` subquery)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "might_contain" in plan
