"""Winnowing document fingerprints (rolling-hash selection; the
MOSS/Schleimer-Wilkerson-Aiken scheme) — north-star C13 fingerprinting.

Per document: hash every character k-gram, slide a window of w hashes,
keep each window's minimum. Guarantees: any shared substring of length
>= w + k - 1 contributes at least one shared fingerprint, so document
overlap detection needs only a fingerprint-set join — the same
explode -> join shape as the shingle tiers, but robust to token
boundaries (plagiarism/quote detection rather than whole-doc near-dup).

All built-in expressions: substring/xxhash64 inside transform over an
ATTRIBUTE column (cheap per-position access — the HOF re-evaluation
pitfall only bites when the lambda references an expression tree).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_prefix60
from .dedup import _persisted, shingle_sets


def _winnow_fingerprints_arrow(spread: DataFrame, k: int, w: int,
                               id_col: str) -> DataFrame:
    """Arrow tier of the fingerprint pass (r15, r14 VERDICT #3 /
    guide §4.2): one ``mapInArrow`` whose batches run the per-doc
    k-gram md5 + windowed-minima fold in numpy/hashlib instead of the
    interpreted JVM array lambda. Why: HOF lambdas are interpreted
    per gram position with no codegen — the r14 sf10 decomposition
    attributed 11.5 of 21.4 s of the pass to the lambda machinery
    alone (no hashing), and the row-explode escape was measured and
    rejected (the 150M-row sort+window+distinct costs more). Handing
    the whole batch to native code removes the interpreter from the
    loop: measured 27.8-33.0 -> 12.6-13.9 s at sf10 (2.3x), 2.4 ->
    1.6 s at sf1, with output equal element-for-element. Only the
    two input columns cross the boundary (guide §4.1), and the
    fold is deterministic per row (safe under task retry).

    The whole worker function is a NESTED closure pickled by value
    (the session.py convention: workers must not import this package
    — the round driver runs from a foreign cwd where the import would
    fail; verified by driver_sim, which caught exactly that on the
    first cut of this tier)."""
    def fn(batches):
        import numpy as np
        import pyarrow as pa
        from hashlib import md5

        def fps_one(s):
            # per-position md5-prefix60 k-gram hashes (CODE-POINT
            # grams over the utf-8 bytes, matching Spark substring
            # semantics: byte-sliced ASCII fast path, continuation-
            # byte offsets for multibyte), sliding window-of-w
            # minima, first-occurrence-order distinct — equal
            # element-for-element to the JVM expression tier (pinned
            # by tests/test_winnowing_containment.py and corpus-wide
            # at sf0.1/sf1)
            if not s:
                return []
            b = s.encode("utf-8")
            if len(b) == len(s):
                n = len(b) - k + 1
                if n < 1:
                    return []
                h = np.fromiter(
                    (int.from_bytes(md5(b[i:i + k]).digest()[:8],
                                    "big") >> 4
                     for i in range(n)),
                    dtype=np.int64, count=n,
                )
            else:
                n = len(s) - k + 1
                if n < 1:
                    return []
                arr = np.frombuffer(b, dtype=np.uint8)
                starts = np.flatnonzero((arr & 0xC0) != 0x80)
                offs = np.append(starts, len(b))
                h = np.fromiter(
                    (int.from_bytes(
                        md5(b[offs[i]:offs[i + k]]).digest()[:8],
                        "big") >> 4
                     for i in range(n)),
                    dtype=np.int64, count=n,
                )
            if n < w:
                return []
            m = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
            _, idx = np.unique(m, return_index=True)
            return m[np.sort(idx)].tolist()

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            fps = pa.array(
                [fps_one(t) for t in texts],
                type=pa.list_(pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, fps], [id_col, "fingerprints"]
            )

    return spread.mapInArrow(
        fn, f"{id_col} long, fingerprints array<bigint>"
    )


def winnow_fingerprints(docs: DataFrame, k: int = 12, w: int = 6,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        hash_fn: Callable[[Column], Column] | None = None,
                        ) -> DataFrame:
    """(id, fingerprints: array<bigint> distinct winnowed hashes).

    Defaults (k=12, w=6) target substring matches of >= 17 chars —
    short k on a repetitive vocabulary makes every document share
    fingerprints and the downstream pair join quadratic.

    ``hash_fn`` defaults to xxhash64 (production tier); pass
    ``functions.hashing.md5_prefix60`` for the oracle-bridge tier
    DuckDB reproduces bit-for-bit. The md5 tier dispatches to the
    Arrow fold (``_winnow_fingerprints_arrow``) — value-identical,
    ~2.3x at sf10; arbitrary ``hash_fn`` columns keep the JVM
    expression tier (a Column-valued hash can't cross the Python
    boundary)."""
    use_arrow = hash_fn is md5_prefix60
    hash_fn = hash_fn or (lambda c: F.xxhash64(c))
    # Materialize lower(text) as an ATTRIBUTE before the k-gram
    # lambda: HOF lambdas are interpreted with no common-subexpression
    # elimination, so substring(lower(text), i, k) inside the lambda
    # would re-lowercase the WHOLE document at every gram position —
    # O(len^2) per doc. The repartition doubles as the projection
    # barrier that keeps the lowered column materialized.
    spread = docs.select(
        id_col, F.lower(F.col(text_col)).alias("__lt")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    if use_arrow:
        # lower() stays JVM-side (locale-exact parity with the
        # expression tier); only (id, __lt) cross the boundary.
        return _winnow_fingerprints_arrow(spread, k, w, id_col)
    text = F.col("__lt")
    # k-gram rolling hashes; empty when the doc is shorter than k
    n_grams = F.length(text) - (k - 1)
    grams = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    hashed = spread.select(
        id_col,
        F.transform(grams, lambda i: hash_fn(F.substring(text, i, k))).alias("hs"),
    )
    # Windowed minima as a fold of w SHIFTED SLICES zipped with
    # least() — the word_shingles trick: each zip_with touches already
    # materialized arrays, so the whole minima pass costs O(w) array
    # traversals per doc. The direct shape — transform(windows, j ->
    # array_min(slice(hs, j, w))) — runs an interpreted slice+min per
    # WINDOW, O(n*w) lambda evaluations per doc (measured ~1.3x slower
    # end-to-end on the sf1 pair pipeline: 5.9 s -> 4.4-5.0 s warm,
    # identical output).
    m = F.size("hs") - (w - 1)  # window count when size >= w
    acc = F.slice("hs", 1, m)
    for j in range(1, w):
        acc = F.zip_with(
            acc, F.slice("hs", j + 1, m), lambda a, b: F.least(a, b)
        )
    minima = F.when(m >= 1, acc).otherwise(F.array().cast("array<bigint>"))
    return hashed.select(
        id_col, F.array_distinct(minima).alias("fingerprints")
    )


def fingerprint_overlap_pairs(docs: DataFrame, min_shared: int = 3,
                              k: int = 12, w: int = 6, max_df: int = 50,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              hash_fn: Callable[[Column], Column] | None = None,
                              _arrays: DataFrame | None = None,
                              ) -> DataFrame:
    """Pairs sharing >= min_shared winnowed fingerprints (d1 < d2) —
    substring-overlap candidates.

    max_df drops "stop fingerprints" (present in more than max_df
    docs) BEFORE the self-join: a fingerprint shared by m documents
    contributes m^2/2 pairs, so ubiquitous substrings — boilerplate,
    license headers, common phrases — are exactly the join skew that
    must be capped at scale; they carry no pair-discrimination signal
    anyway. ``_arrays`` injects an already-persisted
    winnow_fingerprints frame so a host that featurized the corpus
    once (the cont_index ingest loop) does not pay it again — the
    incremental-module ``_sets`` convention."""
    # persist the fingerprint ARRAYS before exploding: explode
    # re-evaluates its generator expression per output element, so an
    # unmaterialized winnow expression would be recomputed ~|fps|
    # times per doc (measured 50x slowdown).
    arrays = _arrays if _arrays is not None else _persisted(
        winnow_fingerprints(docs, k, w, id_col, text_col, hash_fn)
    )
    fp = arrays.select(id_col, F.explode("fingerprints").alias("fp"))
    # Stop-fingerprint cap as an ANTI join of the (tiny,
    # boilerplate-only) HOT set instead of an inner join against the
    # corpus-sized rare set (r14 optimization round — the
    # _drop_hot_buckets pattern from the LSH tier): the inner-join
    # shape shuffled the exploded fingerprint rows a second time just
    # to re-key them on fp; the anti join filters them in place, so
    # the self-join's exchange is the only corpus-fingerprint shuffle
    # left. Same df <= max_df semantics, measured ~10% off the pair
    # stage at sf1.
    #
    # r15: the hot set is PERSISTED — the anti join's build side is
    # referenced once per self-join side, and unpersisted the whole
    # hot aggregate (fingerprint explode + full-corpus exchange +
    # agg) executed twice per action (plan-verified: two disjoint
    # Exchange/HashAggregate subtrees in plans/r14/
    # q_winnow_overlap_after.txt nodes 15-22 and 30-40). One full
    # fingerprint shuffle saved per action at any scale. The explicit
    # F.broadcast hint is GONE (r14 VERDICT #6, guide §3): the hot
    # set is occurrences/max_df-bounded, which a boilerplate-heavy
    # 100 TB corpus can push past the broadcast cap — the planner/AQE
    # now picks broadcast from the (tiny) runtime size instead of
    # being forced, and falls back to a shuffle join when it does not
    # fit (pinned by tests/test_winnowing_containment.py's
    # threshold=-1 fallback test). Interleaved fresh-JVM A/B at
    # sf0.1 (r15): steady 1.97/1.94 -> 1.83/1.79/1.61 s (winnow),
    # 2.73/2.69 -> 2.50/2.56 s (containment) — the persist pays for
    # the lost hint and more (AQE still broadcasts from the runtime
    # size).
    hot = _persisted(
        fp.groupBy("fp").agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df).select("fp")
    )
    fp_rare = fp.join(hot, "fp", "left_anti")
    a, b = fp_rare.alias("a"), fp_rare.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def containment_pairs_blocked(docs: DataFrame, threshold: float,
                              id_col: str = "doc_id",
                              text_col: str = "text", n: int = 3,
                              k: int = 12, w: int = 6,
                              min_shared: int = 2, max_df: int = 50,
                              hash_fn: Callable[[Column], Column] | None = None,
                              _arrays: DataFrame | None = None,
                              _sets: DataFrame | None = None,
                              ) -> DataFrame:
    """DIRECTED n-gram containment at scale: winnowing fingerprints
    PROPOSE candidate pairs, the exact shingle-set ratio CONFIRMS on
    the candidate set only — the composition
    operators/dedup.py:ngram_containment_pairs' scale disposition
    names as the 100 TB path for short-in-long duplication (SURVEY
    C11, r12 record). Same output schema as the exact tier:
    (src, dst, containment) where C(src -> dst) = |S_src ∩ S_dst| /
    |S_src| >= threshold; both passing directions emit.

    Why this composition works where banding can't: MinHash-LSH
    estimates the SYMMETRIC Jaccard, which -> 0 for a short doc
    quoted inside a long one, so the banded tier (correctly) never
    proposes the pair. Winnowing selects rolling-hash minima
    POSITIONALLY — a quoted span contributes the same fingerprints
    to both documents regardless of the length ratio — so the
    df-capped fingerprint equi-join surfaces exactly this class.

    Cost shape: the propose stage is the fingerprint tier's capped
    equi-join (linear fingerprint rows, max_df bounds the per-key
    blowup); the confirm stage is candidate-bounded — one equi-join
    of the pair list against the shingle-set arrays per side, then an
    IN-ROW array_intersect (no shingle explode, no second shuffle
    over the corpus). Nothing quadratic in the corpus anywhere.

    RECALL STATEMENT (measured in tests/test_winnowing_containment.py
    on planted short-in-long corpora vs the brute-force exact tier):
    NOT complete in general — this is a filter-and-verify scheme, and
    a pair is proposed only when the shared content includes
    contiguous character spans: a shared span of length >=
    w + k - 1 chars is guaranteed >= 1 shared fingerprint (the
    winnowing guarantee), and clearing ``min_shared`` needs roughly
    one additional window (w chars) per extra required print — all
    subject to the shared prints surviving the ``max_df`` stop-print
    cap. Containment reached through SCATTERED shared n-grams with no
    span of >= w + k - 1 chars is invisible to the propose stage by
    design. Quoted-extract / partial-copy duplication — the class
    this exists for — is contiguous and well inside the guarantee at
    the defaults (spans >= 17 chars). Precision is exact: the confirm
    stage recomputes the true set ratio, so every emitted row is a
    true containment pair (a subset of the brute-force tier's
    output restricted to proposed candidates)."""
    t = float(threshold)
    cands = fingerprint_overlap_pairs(
        docs, min_shared, k, w, max_df, id_col, text_col, hash_fn,
        _arrays=_arrays,
    ).select("d1", "d2")
    sets = _sets if _sets is not None else _persisted(
        shingle_sets(docs, id_col, text_col, n)
    )
    s1 = sets.select(
        F.col(id_col).alias("d1"), F.col("shs").alias("__shs1"),
        F.col("sz").alias("sz1"),
    )
    s2 = sets.select(
        F.col(id_col).alias("d2"), F.col("shs").alias("__shs2"),
        F.col("sz").alias("sz2"),
    )
    # persisted: the fwd/rev branches below UNION over this frame, and
    # without the cache each branch re-runs the whole propose equi-join
    # and confirm join (measured ~2x the probe cost at sf1/sf10, r14).
    # Candidate-bounded rows — tiny relative to the corpus.
    inter = _persisted(
        cands.join(s1, "d1").join(s2, "d2")
        .select(
            "d1", "d2", "sz1", "sz2",
            F.size(F.array_intersect("__shs1", "__shs2")).alias("inter"),
        )
    )
    fwd = (
        inter.where(F.col("inter") / F.col("sz1") >= t)
        .select(
            F.col("d1").alias("src"), F.col("d2").alias("dst"),
            (F.col("inter") / F.col("sz1")).alias("containment"),
        )
    )
    rev = (
        inter.where(F.col("inter") / F.col("sz2") >= t)
        .select(
            F.col("d2").alias("src"), F.col("d1").alias("dst"),
            (F.col("inter") / F.col("sz2")).alias("containment"),
        )
    )
    return fwd.unionByName(rev)
