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
from ..functions.localdf import local_df

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


def mixture_recipe(sources: list[tuple[str, DataFrame]],
                   rates: dict[str, float],
                   token_budget: int | None = None,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """The "data recipe" report a pretraining run starts from: per
    source — document/token inventory, sampling rate, expected tokens
    CONTRIBUTED at that rate, the resulting share of the mix, and (when
    ``token_budget`` is given) the effective epochs each source's data
    sees if the mixed stream is consumed until the budget is spent.
    Effective epochs is the overfit/memorization dial practitioners
    actually watch — a 4x up-weighted small source at a 10x-data budget
    trains ~40 epochs over that source.

    One token-count aggregate per source (a scan each, no shuffle
    beyond the 1-row aggregates); the arithmetic is driver-side over
    S rows."""
    from ..functions.text import tokens

    spark = sources[0][1].sparkSession
    rows = []
    for name, df in sources:
        r = float(rates.get(name, 0.0))
        if r < 0:
            raise ValueError(f"rate for {name!r} must be >= 0, got {r}")
        agg = df.agg(
            F.count("*").alias("docs"),
            F.coalesce(
                F.sum(
                    F.when(F.col(text_col).isNull(), 0).otherwise(
                        F.size(tokens(text_col))
                    )
                ),
                F.lit(0),
            ).alias("toks"),
        ).collect()[0]
        rows.append((name, int(agg["docs"]), int(agg["toks"]), r,
                     agg["toks"] * r))
    total_contrib = sum(c for *_, c in rows) or 1.0
    out = []
    for name, docs, toks, r, contrib in rows:
        share = contrib / total_contrib
        if token_budget is None:
            epochs = None
        else:
            # consuming the mix to the budget replays each source's
            # own data share/source_tokens times
            epochs = (
                (share * token_budget) / toks if toks else None
            )
        out.append((name, docs, toks, r, int(contrib), share, epochs))
    return local_df(
        spark, out,
        "source string, n_docs long, n_tokens long, rate double, "
        "contributed_tokens long, mix_share double, "
        "effective_epochs double",
    )
