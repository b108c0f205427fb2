"""Exact substring deduplication with REMOVAL semantics (the Lee et
al. 2022 "Deduplicating Training Data Makes Language Models Better"
ExactSubstr tier): remove every later occurrence of a long exact token
span repeated anywhere in the corpus — across documents or within one
— keeping exactly one copy. This is the granularity between
paragraph-level exact dedup (operators/paradedup.py — cuts only at
structural separators) and winnowing overlap DETECTION
(operators/winnowing.py — reports pairs, removes nothing): spans that
straddle paragraph boundaries, boilerplate injected mid-sentence, and
long quoted passages all fall through paradedup and land here.

Semantics
---------
* The unit is the literal-single-space token: ``split(text, ' ')``
  re-joined with ``' '`` is the identity for ANY input, so
  reconstruction is exact without storing character offsets.
* A *window* is k consecutive tokens (stride 1); its identity is md5
  of its exact text (the tokens joined with ' ' — i.e. the original
  character span). A window is *duplicated* if its text occurs >= 2
  times corpus-wide.
* The *keeper* occurrence of each duplicated window is the globally
  first by (doc_id, pos) — the same deterministic min-struct
  convention as every other dedup tier.
* A token is REMOVED iff it is covered by at least one non-keeper
  occurrence of a duplicated window AND by no keeper occurrence.
  Keeper coverage is what guarantees exactly one copy of every
  duplicated span survives (without it, self-overlapping repeats —
  "x x x x ..." — would eat the keeper too); overlapping and
  adjacent duplicated windows merge into maximal removed spans
  implicitly through position-level marking, which is Lee et al.'s
  merge-adjacent step without an explicit interval pass.
* Duplicated spans SHORTER than k tokens never form a full window and
  are untouched — k is the minimum removable span length, exactly the
  paper's >= 50-token threshold knob.
* Surviving tokens are reassembled in original order; documents whose
  every token was removed keep their row with empty text (loss is
  visible, not a silent drop); null-text documents pass through 0/0.

Scale shape
-----------
Suffix arrays (the paper's machinery) don't distribute; this is the
fixed-stride-window formulation: one projection builds all window
hashes inside array land (transform over sequence — no O(n^2) row
blowup from carrying the token array through an explode), O(n*k)
bytes hashed — a constant 20-50x factor on a linear, shuffle-free,
embarrassingly-parallel map pass (the same per-position cost shape
as winnowing's k-gram hashing; a true O(1)-per-window polynomial
rolling hash needs wrap-around long arithmetic, which Spark 4's
ANSI overflow semantics make a poor codegen fit — documented trade,
not an oversight); the duplicate decision is one shuffle on the window hash
with bounded per-key state (count + min(struct) fold map-side — the
boilerplate span repeated millions of times is the hottest key and
folds to one struct per partition); ONLY duplicated occurrences
explode into per-token coverage (k rows each — cost proportional to
duplicated volume, not corpus volume); the rebuild joins the folded
per-doc removed-position arrays (duplicated-volume-bounded) back to
the token arrays and reassembles IN-ROW (array_except + element_at
gather), so no corpus-wide token shuffle exists anywhere. No UDFs —
split, transform, hash, join and rebuild are all codegen.

DuckDB twin: queries/dedup.py:q_substring_dedup (row_number-over-hash
keep-first + generate_series coverage — identical removed set).
Reference anchor: SURVEY.md C10 north-star row; the reference repo
(Java server + `notebooks/ethereum_data_analysis.ipynb`) has no dedup
tier at all — this is LLM-pipeline capability beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Auto-escalation threshold for the window-id hash (r15, r14 VERDICT
# #5): the 64-bit tier's expected false-dup count ~ W^2 / 2^65 stays
# < 1 up to ~10^9 windows (~100 GB of text, ~25 GB of compressed
# parquet). Escalate to the 128-bit composite well before that — at
# 4 GB of plan-estimate bytes (~10^8 windows, expected collisions
# ~1e-3). Beyond the gate a collision would REMOVE real text (a
# false-duplicate span), which is the one failure mode a dedup tier
# must not have at 100 TB; below it the cheaper hash is provably
# safe. Plan-time only (no job runs).
_X128_MIN_BYTES = 4 << 30


def dedup_substrings(docs: DataFrame, k: int = 50,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     window_hash: str = "auto") -> DataFrame:
    """(id_col, text, n_kept, n_dropped): the corpus with every later
    occurrence of a duplicated >=k-token span removed and documents
    reassembled from their surviving tokens. ``n_kept``/``n_dropped``
    count TOKENS (the removal unit here), unlike paradedup's
    paragraph counts.

    ``window_hash`` picks the window-identity hash (r14 optimization
    round; "auto"/"xxhash128" added r15 per VERDICT #5):

    * ``"auto"`` (default) — ``"xxhash64"`` while the corpus's
      plan-time size estimate is under ``_X128_MIN_BYTES``,
      ``"xxhash128"`` above it. Plan-time only; both tiers mark the
      same windows absent collisions, and the gate sits ~10x below
      where 64-bit birthday collisions become material, so the
      output is tier-invariant by construction.
    * ``"xxhash64"`` — per-token xxhash64 materialized once per
      document, window id = xxhash64 over the k-long slice of token
      hashes. Hashing longs instead of re-joining the text slice per
      position roughly HALVES the occ pass (measured 8.7 -> 4.4 s at
      sf1, and the pass runs twice), and the 8-byte group key
      shuffles a quarter of md5's 32-char hex. Collision envelope:
      expected false-dup pairs ~ W^2/2^65 stay < 1 up to ~10^9
      windows (~100 GB of text) — a collision REMOVES real text, so
      past the envelope use a wider tier (what "auto" does).
    * ``"xxhash128"`` — TWO independent channels: a second token-hash
      array salted with lit(1) and a second window hash over it;
      group/join key (h1, h2), 8+8 bytes. Same plan shape (one more
      projection column, no extra exchange); ~15-20% on the occ pass
      (measured 4.2-4.6 -> 5.1-5.4 s at sf1). Expected false dups
      ~ W^2/2^129: < 1 up to ~10^19 windows — covers 100 TB
      (~10^13-10^14 windows) with 10 orders of magnitude of margin.
      Independent channels also cover single-token xxhash64
      collisions (a derived second hash would inherit them).
    * ``"md5"`` — 128-bit md5 of the joined token slice (the exact
      character span), collision-free at any realistic scale and what
      the DuckDB oracle replays verbatim. ~2x the occ cost.

    All tiers mark the SAME windows duplicated absent collisions, so
    the rebuilt output is identical (verified corpus-wide at sf0.1
    and sf1 for xxhash64 vs xxhash128 vs md5)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (a 1-token window would "
                         f"remove every repeated word), got {k}")
    if window_hash not in ("auto", "xxhash64", "xxhash128", "md5"):
        raise ValueError(f"unknown window_hash: {window_hash!r}")
    if window_hash == "auto":
        try:
            est = int(docs._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        except Exception:
            est = None
        window_hash = (
            "xxhash128" if est is None or est >= _X128_MIN_BYTES
            else "xxhash64"
        )
    # scale-adaptive repartition: a compact parquet corpus arrives as
    # 1-2 scan partitions, which would run the O(n*k) window-hash
    # explode on 1-2 cores (functions/spread.py; r14 optimization
    # round — measured 9.2 -> 1.2 s for the comparable DSIR feature
    # pass at sf1). The round-robin shuffle moves the document rows
    # once, before the 20-50x window blowup.
    from ..functions.spread import spread

    toks_arr = spread(
        docs.where(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.col(text_col)
        )
    ).select(
        F.col(id_col), F.split(F.col(text_col), " ", -1).alias("__t")
    )
    # All window (pos, hash) pairs built inside one array projection:
    # the hash keys the window on its exact token span (the
    # literal-space convention makes that the character span). The
    # xxhash64 tier hashes each token ONCE into a materialized long
    # array and windows hash slices of it — O(n) token hashes + O(n*k)
    # long-hashing instead of O(n*k) string building + md5.
    big = toks_arr.where(F.size("__t") >= k)
    if window_hash == "md5":
        occ_src = big.select(id_col, F.size("__t").alias("__n"), "__t")
        win_hs = [lambda i: F.md5(
            F.array_join(F.slice("__t", i + 1, k), " ")
        ).alias("h")]
    elif window_hash == "xxhash128":
        occ_src = big.select(
            id_col, F.size("__t").alias("__n"),
            F.transform("__t", lambda tk: F.xxhash64(tk)).alias("__th"),
            F.transform("__t", lambda tk: F.xxhash64(tk, F.lit(1))).alias(
                "__th2"
            ),
        )
        win_hs = [
            lambda i: F.xxhash64(F.slice("__th", i + 1, k)).alias("h"),
            lambda i: F.xxhash64(F.slice("__th2", i + 1, k)).alias("h2"),
        ]
    else:
        occ_src = big.select(
            id_col, F.size("__t").alias("__n"),
            F.transform("__t", lambda tk: F.xxhash64(tk)).alias("__th"),
        )
        win_hs = [lambda i: F.xxhash64(
            F.slice("__th", i + 1, k)
        ).alias("h")]
    hkeys = ["h"] if len(win_hs) == 1 else ["h", "h2"]
    occ = (
        occ_src
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - k),
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        *[wh(i) for wh in win_hs],
                    ),
                )
            ).alias("__w"),
        )
        .select(id_col, F.col("__w.pos").alias("pos"),
                *[F.col(f"__w.{hk}").alias(hk) for hk in hkeys])
    )
    # occ feeds BOTH the keep-first aggregate and the join probe, so
    # the plan runs the window-hash projection twice — MEASURED as the
    # right trade: persisting it on the cache ledger was 18% faster at
    # sf1 but 34% SLOWER at sf10 (31.5 -> 42.2 s warm), because
    # materializing corpus-sized (id, pos, md5) rows costs more than
    # recomputing a shuffle-free map pass; recompute wins at the scale
    # that matters (BASELINE.md r12).
    dup_first = (
        occ.groupBy(*hkeys)
        .agg(
            F.count("*").alias("__c"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"),
        )
        .where(F.col("__c") >= 2)
        .select(*hkeys, "__first")
    )
    dup_occ = occ.join(dup_first, hkeys).select(
        id_col,
        "pos",
        (F.struct(F.col(id_col), F.col("pos")) == F.col("__first")).alias(
            "is_keeper"
        ),
    )
    # Position-level coverage: explode only the duplicated occurrences.
    removed = (
        dup_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tp"),
            "is_keeper",
        )
        .groupBy(id_col, "tp")
        .agg(F.max("is_keeper").alias("__prot"))
        .where(~F.col("__prot"))
        .select(id_col, "tp")
    )
    # Rebuild IN ARRAY LAND (r14 optimization round): fold the (small,
    # duplicated-volume-bounded) removed positions into one array per
    # affected doc and join THAT to the token arrays — the surviving
    # text is then pure in-row math (array_except of the position
    # range, element_at gather, array_join). The previous shape
    # posexploded EVERY corpus token, anti-joined the removal set and
    # re-aggregated tokens through a corpus-wide collect_list shuffle
    # — at 100 TB that shuffles the whole corpus once more for what a
    # per-row projection can do (measured -2-6 s of 25 s at sf1; one
    # fewer corpus pass, 4 -> 3). Untouched docs (__rm null — the
    # overwhelming majority) pass through as the identity re-join of
    # their own tokens. The per-doc removed-position buffer is bounded
    # by the document's own token count, the same bound the old
    # rebuild buffer had.
    rm = removed.groupBy(id_col).agg(F.collect_list("tp").alias("__rm"))
    joined = toks_arr.join(rm, id_col, "left")
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("__t") - 1), F.col("__rm")
    )
    out_arr = joined.select(
        id_col,
        F.when(F.col("__rm").isNull(), F.array_join("__t", " "))
        .otherwise(
            F.array_join(
                F.transform(kept_pos, lambda p: F.element_at("__t", p + 1)),
                " ",
            )
        ).alias(text_col),
        F.when(F.col("__rm").isNull(), F.size("__t"))
        .otherwise(F.size("__t") - F.size("__rm"))
        .cast("long").alias("n_kept"),
        F.coalesce(F.size("__rm"), F.lit(0)).cast("long").alias("n_dropped"),
    )
    base = docs.select(id_col).join(out_arr, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias(
            "n_dropped"
        ),
    )
