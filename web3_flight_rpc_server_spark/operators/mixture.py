"""Deterministic mixture sampling: weighted multi-source corpus
composition (north-star C19 adjunct — the "data mixture" step of a
pretraining pipeline: N epochs of a high-quality source, a fraction
of a web crawl, etc.).

Each source's rate r decomposes into floor(r) FULL epochs plus one
hash-sampled partial epoch at the fractional remainder. The partial
epoch keeps a row iff a uniform-in-[0,1) value derived from
(id, source, seed) falls below the fraction — the same md5-bridge
hashing trick as the split/stratified-sampling ops
(functions/hashing.py), so composition is reproducible across runs,
partitionings, AND engines (a DuckDB twin derives the identical keep
set; fuzzed in tests).

Every output row is tagged (source, epoch): downstream packing or
sharding can interleave deterministically, and the per-source epoch
index is what a trainer needs to de-duplicate metrics across repeats.
Unioning full-scan epochs is a METADATA replication — Spark plans one
scan per epoch over the same files, no materialized copy — and the
partial epoch pushes its hash filter into the scan.

Oversampling whole epochs by replication (not fractional-rate > 1
sampling with replacement) matches trainer convention: every example
of an up-weighted source appears exactly floor(r) or ceil(r) times,
never 0 or 5 times by chance.

No counterpart in the reference; composes with q_train_split's
deterministic bucketing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import MD5_PREFIX60_SQL, md5_prefix60

# [0, 1) uniform from a 60-bit hash
_DENOM = float(1 << 60)


def _uniform(id_col: str, source: str, seed: int):
    key = F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(source), F.lit(str(seed))
    )
    return md5_prefix60(key) / F.lit(_DENOM)


def uniform_sql(id_expr: str, source: str, seed: int) -> str:
    """DuckDB twin of the per-row uniform draw."""
    key = f"(CAST({id_expr} AS VARCHAR) || ':{source}:{seed}')"
    return f"({MD5_PREFIX60_SQL.format(key)} / {_DENOM!r})"


def mixture_sample(sources: list[tuple[str, DataFrame]],
                   rates: dict[str, float], seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """Union of the weighted sources, each row tagged
    (source, epoch). ``sources`` is an ordered list of (name, df) —
    all frames must share a schema; ``rates[name]`` >= 0 is the
    sampling rate (1.0 = exactly one epoch, 2.25 = two full epochs
    plus a deterministic quarter)."""
    outs = []
    for name, df in sources:
        r = rates[name]
        if r < 0:
            raise ValueError(f"rate for {name!r} must be >= 0, got {r}")
        full = int(math.floor(r))
        frac = r - full
        for e in range(full):
            outs.append(
                df.select(
                    "*",
                    F.lit(name).alias("source"),
                    F.lit(e).alias("epoch"),
                )
            )
        if frac > 0:
            outs.append(
                df.where(_uniform(id_col, name, seed) < frac).select(
                    "*",
                    F.lit(name).alias("source"),
                    F.lit(full).alias("epoch"),
                )
            )
    if not outs:
        raise ValueError("mixture_sample needs at least one source "
                         "with a positive rate")
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out
