"""Distributed quality classifier (C13 extension): logistic
regression over hashed unigram+bigram bag-of-words features — the
fastText-shaped discriminative tier modern curation pipelines train
to score documents (DCLM, FineWeb-Edu style: label a small seed set,
fit a linear model, score the whole pool). Sits above the generative
tiers in operators/lm.py: DSIR reweights by a ratio of multinomials;
this trains a discriminative boundary on the same feature map.

Training is full-batch gradient descent where EVERY per-iteration
quantity the cluster computes is bucket- or document-bounded:

- The feature table (doc_id, b, cnt) is built once (one explode +
  one hash agg) and persisted hash-partitioned by doc_id.
- Margins: one broadcast join of the B-row weight table + a doc_id
  agg that reuses the feature table's partitioning (no shuffle).
- Gradient: residuals join back to features ON doc_id — co-partitioned
  by construction, so the only shuffle per iteration is the B-bounded
  map-side-combined gradient agg, and the only driver traffic is the
  B-row gradient collect (the same driver-bounded-partials contract as
  operators/kmeans.py's K x dim updates).

So per iteration the cluster moves O(B) rows regardless of corpus
size, and the model is a B+1 vector that broadcasts for scoring —
the identical why-this-scales argument as DSIR's log-ratio table.
Scoring is one broadcast join + one agg, all codegen, no UDFs.

The md5-bridge feature hash (operators/lm.py:hashed_features) keeps
scoring bit-replicable in DuckDB: q_quality_score persists the
trained weights and its oracle recomputes every document's score from
raw text + the weights table alone (the q_trained_cells at-rest
pattern). Training itself is an iterative fixpoint SQL cannot
express; it is reference-pinned against numpy in tests/test_classifier.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from .lm import hashed_features


def hashed_doc_features(docs: DataFrame, buckets: int,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        hasher: str = "xxhash64") -> DataFrame:
    """(id_col, b, cnt): per-document hashed-feature occurrence
    counts — the sparse design matrix, one row per nonzero.
    ``hasher`` as in operators/lm.py:hashed_features (xxhash64
    production tier, md5 oracle bridge); fit and score must agree."""
    return (
        hashed_features(docs, buckets, id_col, text_col, hasher)
        .groupBy(id_col, "b")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


# negative-b sentinel encodings for the persisted weight table:
# scoring filters on b >= 0 / b = -1, so metadata rides invisibly
_DAMPING_CODE = {"none": 0.0, "log": 1.0}
_HASHER_CODE = {"xxhash64": 0.0, "md5": 1.0}


@dataclass(frozen=True)
class LinearModel:
    """Trained weights: ``w[b]`` per hash bucket plus an intercept.

    ``damping`` and ``hasher`` record HOW the model was fit — the
    scorers validate against them so a log-damped model can never
    silently flow into the damping="none"-only in-row gate, and a
    persisted model scored with the wrong feature hash raises
    instead of producing plausible-but-wrong scores."""

    weights: np.ndarray  # shape (buckets,)
    bias: float
    buckets: int
    damping: str = "log"
    hasher: str = "xxhash64"

    def as_df(self, spark: SparkSession) -> DataFrame:
        """(b, w) weight table; the intercept rides as b = -1 and the
        training config as negative sentinel rows (b = -2 bucket
        count, b = -3 damping code, b = -4 hasher code) so one
        parquet file carries the whole self-describing model — every
        consumer filters b >= 0 / b = -1, so the sentinels are
        invisible to scoring math and to the DuckDB oracle."""
        rows = [(int(b), float(w)) for b, w in enumerate(self.weights)]
        rows.append((-1, float(self.bias)))
        rows.append((-2, float(self.buckets)))
        rows.append((-3, _DAMPING_CODE[self.damping]))
        rows.append((-4, _HASHER_CODE[self.hasher]))
        return local_df(spark, rows, "b long, w double")


def _damp(cnt_col, damping: str):
    if damping == "log":
        return F.lit(1.0) + F.log(cnt_col)
    if damping == "none":
        return cnt_col
    raise ValueError(f"unknown damping: {damping!r}")


def damped_features(docs: DataFrame, buckets: int,
                    id_col: str = "doc_id", text_col: str = "text",
                    hasher: str = "xxhash64",
                    damping: str = "log") -> DataFrame:
    """(id_col, b, x): the damped per-(doc, bucket) design values that
    BOTH the fits and the batch scorers consume — factored out so a
    caller that fits and then scores the same corpus (q_langid's
    train-then-score shape) can persist ONE table and pay the feature
    hash a single time instead of once per pass. The md5 oracle-bridge
    hash is the expensive half of either pass (~10x xxhash64 on the
    feature firehose), so sharing it halves the corpus-side cost of
    fit+score at any scale. Rows ride the caller's partitioning
    (spread=False): partition by ``id_col`` first so the (id, b) agg,
    the fits' per-doc fold and the scorers' margin agg all reuse one
    exchange. Caller must pass the SAME buckets/hasher/damping to the
    fit/score consuming it — the table is not self-describing (the
    persisted weight table is; this is an in-process intermediate)."""
    return (
        hashed_features(docs, buckets, id_col, text_col, hasher,
                        spread=False)
        .groupBy(id_col, "b")
        .agg(F.count("*").cast("double").alias("cnt"))
        .select(id_col, "b", _damp(F.col("cnt"), damping).alias("x"))
    )


# Driver-local iteration tier for the fits (r14 optimization round):
# when the optimizer's plan-time estimate of the (id, text) projection
# is at most this many bytes, the CSR design blocks are collected to
# the driver ONCE (same partition structure, same order) and the
# gradient-descent iterations run in-process. The arithmetic is
# BITWISE-identical to the distributed tier — each block's partial
# starts from the same zero accumulator and the partials fold in
# partition order, exactly the treeAggregate(depth=1) sequence — so
# the tier choice is invisible in the weights (asserted exactly in
# tests/test_langid.py). Why: each distributed iteration pays a fixed
# ~0.3-0.4 s of job/task plumbing to compute a (B+1) x C gradient
# over megabytes — 8 iterations of pure overhead at bench scale —
# while the collected blocks are ~20x the compressed text estimate
# (1 MB gate ≈ tens of MB of numpy on the driver, the broadcast-size
# regime). At real corpus sizes the estimate clears the gate and the
# fit stays distributed; the gate is plan-time only (no job runs).
_LOCAL_FIT_MAX_BYTES = 1 << 20


def _plan_size(df: DataFrame) -> int | None:
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def _prepared_design(docs: DataFrame, label_expr, buckets: int,
                     id_col: str, text_col: str, hasher: str,
                     damping: str,
                     feats: DataFrame | None = None) -> DataFrame:
    """(id, y, fv) — the per-doc label + feature-vector rows both
    design-block builders slice into CSR blocks. One corpus shuffle:
    see _design_blocks' docstring."""
    if feats is None:
        base = docs.select(
            F.col(id_col), label_expr.alias("y"), F.col(text_col)
        ).repartition(id_col)
        feats = damped_features(base, buckets, id_col, text_col,
                                hasher, damping)
    else:
        # caller-shared design values (damped_features, typically
        # persisted): the label spine no longer needs text at all, so
        # the label shuffle carries (id, y) only
        base = docs.select(
            F.col(id_col), label_expr.alias("y")
        ).repartition(id_col)
    docvecs = feats.groupBy(id_col).agg(
        F.collect_list(F.struct("b", "x")).alias("fv")
    )
    return base.select(id_col, "y").join(docvecs, id_col, "left")


def _design_blocks(docs: DataFrame, label_expr, buckets: int,
                   id_col: str, text_col: str, hasher: str,
                   damping: str, feats: DataFrame | None = None,
                   persist: bool = True):
    """The fits' cached design matrix: an RDD of ONE numpy CSR block
    per partition — (ys, indptr, idx, vals) with ys the per-doc
    labels, idx/vals the per-doc (bucket, damped count) runs delimited
    by indptr. Feature values are computed entirely Spark-side
    (hashed_features -> per-(doc, bucket) count -> _damp), byte-
    identical to what scoring and the DuckDB oracles recompute; only
    the gradient-descent ITERATION engine consumes the blocks.

    Why this shape (r14 optimization round, guide §1.2/§4.2): the
    per-iteration quantities of full-batch GD are a (B x C) gradient
    and its per-doc softmax/sigmoid inputs — megabytes regardless of
    corpus size — but evaluating them as per-iteration DataFrame jobs
    pays a fixed ~1-2 s/iteration of pure plumbing: either a driver
    createDataFrame + BroadcastExchange per iteration (r13 shape) or,
    with weight-array literals, a fresh non-cacheable codegen compile
    per iteration because the literals change. Caching the design
    matrix ONCE as per-partition numpy arrays turns every iteration
    into a single treeAggregate job whose tasks run one BLAS-style
    pass (np.add.at segment sums) and return a (B+1) x C partial —
    no shuffle, no broadcast build, no recompile. Cluster traffic per
    iteration: the W closure down (B x C doubles), one partial per
    partition up. The corpus crosses the network exactly once, at
    block build.

    One corpus shuffle total: the projected (id, label, text) rows
    hash-partition by doc up front and the feature explode/count, the
    per-doc array fold and the label join all ride that exchange
    (hash partitioning on id satisfies every downstream (id, ...)
    clustering)."""
    prepared = _prepared_design(docs, label_expr, buckets, id_col,
                                text_col, hasher, damping, feats)

    def build(rows):
        ys, lens, idx, vals = [], [], [], []
        for row in rows:
            ys.append(row[1])
            fv = row[2]
            if fv:
                lens.append(len(fv))
                for e in fv:
                    idx.append(e[0])
                    vals.append(e[1])
            else:
                lens.append(0)
        if not ys:
            return
        indptr = np.zeros(len(ys) + 1, dtype=np.int64)
        np.cumsum(lens, out=indptr[1:])
        yield (
            np.array(ys, dtype=object),
            indptr,
            np.array(idx, dtype=np.int64),
            np.array(vals, dtype=np.float64),
        )

    rdd = prepared.rdd.mapPartitions(build)
    return rdd.persist(StorageLevel.MEMORY_AND_DISK) if persist else rdd


def _design_blocks_local(docs: DataFrame, label_expr, buckets: int,
                         id_col: str, text_col: str, hasher: str,
                         damping: str,
                         feats: DataFrame | None = None) -> list:
    """The LOCAL tier's twin of _design_blocks: the same per-partition
    CSR blocks, built on the DRIVER from one Arrow collect instead of
    a JVM->Python-worker pickle pass (r14 optimization round, session
    3). The local tier only ever collect()ed the block RDD, so the
    Python-worker hop — spawn 32 workers, pickle every (id, y, fv)
    row out, build numpy, pickle the arrays back — was pure overhead:
    measured 2.5 s fit -> ~1.0 s at sf0.1 with the Arrow collect.
    Block boundaries and in-block row order are the executed plan's
    partition structure, marked by spark_partition_id() and collected
    in partition order, so the gradient fold remains BITWISE-identical
    to the distributed treeAggregate(depth=1) tier (pinned by the
    tier-equality tests in tests/test_classifier.py /
    tests/test_langid.py)."""
    prepared = _prepared_design(docs, label_expr, buckets, id_col,
                                text_col, hasher, damping, feats)
    tbl = prepared.select(
        F.spark_partition_id().alias("__pid"), "y", "fv"
    ).toArrow()
    pids = tbl.column("__pid").to_numpy(zero_copy_only=False)
    ys_all = tbl.column("y").to_pylist()
    # vectorized CSR extraction straight from the Arrow buffers (r15):
    # the per-row to_pylist + dict loop cost ~0.9 s at sf0.1 — ~40% of
    # the whole block build — for what offsets arithmetic gives for
    # free. flatten() concatenates the non-null lists' structs in row
    # order (exactly the order the old loop appended), so idx/vals are
    # element-identical and the gradient fold stays bitwise-unchanged
    # (the tier-equality pins in tests/test_classifier.py /
    # tests/test_langid.py assert exactly that).
    import pyarrow as pa

    fv_col = tbl.column("fv")
    fv_arr = (fv_col.combine_chunks()
              if isinstance(fv_col, pa.ChunkedArray) else fv_col)
    nrows = len(fv_arr)
    lens = np.zeros(nrows, dtype=np.int64)
    if nrows:
        vl = fv_arr.value_lengths().to_numpy(zero_copy_only=False)
        valid = ~np.asarray(fv_arr.is_null())
        lens[valid] = vl[valid].astype(np.int64)
    flat = fv_arr.flatten()
    idx_all = flat.field("b").to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False
    )
    vals_all = flat.field("x").to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    ends = np.cumsum(lens)
    blocks = []
    # rows arrive in partition order, so same-pid rows are contiguous;
    # split on boundaries to reproduce the per-partition blocks
    bounds = [0] + list(np.flatnonzero(np.diff(pids)) + 1) + [len(pids)]
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        elo = ends[lo - 1] if lo else 0
        ehi = ends[hi - 1]
        indptr = np.zeros(hi - lo + 1, dtype=np.int64)
        indptr[1:] = ends[lo:hi] - elo
        blocks.append((
            np.array(ys_all[lo:hi], dtype=object),
            indptr,
            idx_all[elo:ehi],
            vals_all[elo:ehi],
        ))
    return blocks


def logreg_fit(docs: DataFrame, label_col: str, buckets: int = 1024,
               iters: int = 30, lr: float = 0.5, l2: float = 1e-4,
               id_col: str = "doc_id", text_col: str = "text",
               hasher: str = "xxhash64",
               damping: str = "log") -> LinearModel:
    """Fit sigmoid(bias + sum_b w[b] * cnt[d, b]) to the 0/1
    ``label_col`` by full-batch gradient descent (fixed ``iters`` —
    no data-dependent stopping, so replays do identical work).
    Documents with zero features still anchor the intercept through
    their residual. Feature counts are log-damped (1 + ln cnt) so
    high-count buckets in long documents don't drown the rest —
    the standard tf damping. ``damping="none"`` uses raw counts: the
    margin becomes a PURE per-occurrence sum over features, which is
    what the stateless in-row streaming gate
    (classifier_margin_expr) can evaluate without any aggregation —
    train with "none" when the model must gate a stream.

    Distributed shape (r14 optimization round, identical to
    softmax_fit — the rationale lives on _design_blocks): the design
    matrix is built with ONE corpus shuffle and cached as per-
    partition numpy CSR blocks; each iteration is a single
    treeAggregate whose tasks compute sigmoid residuals and a
    (B+1)-double partial gradient with vectorized numpy — no per-
    iteration broadcast build, no per-iteration codegen compile, no
    shuffle. Null-label docs count toward n (unchanged semantics)
    but contribute nothing to the gradient, exactly as the NULL
    residuals the old per-iteration SQL jobs dropped from their
    sums."""
    est = _plan_size(docs.select(F.col(id_col), F.col(text_col)))
    local = est is not None and est <= _LOCAL_FIT_MAX_BYTES
    if local:
        # driver-side Arrow block build — no Python-worker pass (see
        # _design_blocks_local); the fold below is unchanged
        blocks, blist = None, _design_blocks_local(
            docs, F.col(label_col).cast("double"), buckets, id_col,
            text_col, hasher, damping,
        )
    else:
        blocks = _design_blocks(
            docs, F.col(label_col).cast("double"), buckets, id_col,
            text_col, hasher, damping, persist=True,
        )
        blist = None
    try:
        # one job materializes the cache AND answers n
        if local:
            n = sum(len(blk[0]) for blk in blist)
        else:
            n = blocks.map(lambda blk: len(blk[0])).sum()
        if n == 0:
            raise ValueError("empty corpus")

        w = np.zeros(buckets)
        bias = 0.0
        for _ in range(iters):
            def part_grad(acc, blk, w=w, bias=bias):
                # np.bincount accumulates weights in element order —
                # the same IEEE addition sequence as np.add.at on the
                # same arrays (verified bitwise) — at ~10x the speed
                # (add.at is unbuffered fancy indexing); r14 session 3
                g, gs = acc
                ys, indptr, idx, vals = blk
                nd = len(ys)
                y = np.array(
                    [np.nan if v is None else v for v in ys],
                    dtype=np.float64,
                )
                m = np.zeros(nd)
                if idx.size:
                    rows = np.repeat(
                        np.arange(nd), np.diff(indptr)
                    )
                    m += np.bincount(
                        rows, weights=vals * w[idx], minlength=nd
                    )
                r = 1.0 / (1.0 + np.exp(-(m + bias))) - y
                valid = ~np.isnan(r)
                if idx.size:
                    rv = np.where(valid[rows], r[rows], 0.0)
                    g += np.bincount(
                        idx, weights=rv * vals, minlength=len(g)
                    )
                gs[0] += float(r[valid].sum())
                return g, gs

            if local:
                # same fold as treeAggregate(depth=1): fresh zero acc
                # per block, partials added in partition order
                g, gs = np.zeros(buckets), [0.0]
                for blk in blist:
                    pg, pgs = part_grad((np.zeros(buckets), [0.0]), blk)
                    g += pg
                    gs[0] += pgs[0]
            else:
                # depth=1: the default depth-2 tree adds a combine
                # STAGE (an extra job round-trip) per iteration —
                # measured 5.0 -> 2.9 s over 8 iterations at sf1
                # (r14). Partials are (B+1)-double vectors, so even
                # 10^4 partitions merge on the driver in
                # milliseconds; depth>1 only pays past that.
                g, gs = blocks.treeAggregate(
                    (np.zeros(buckets), [0.0]), part_grad,
                    lambda a, b: (a[0] + b[0], [a[1][0] + b[1][0]]),
                    depth=1,
                )
            w -= lr * (g / n + l2 * w)
            bias -= lr * (gs[0] / n)
    finally:
        if not local:
            blocks.unpersist()
    return LinearModel(w, float(bias), buckets, damping, hasher)


def classifier_score(docs: DataFrame, model_df: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     hasher: str = "xxhash64",
                     damping: str = "log") -> DataFrame:
    """(id_col, score): sigmoid quality score per document from a
    (b, w) weight table (intercept at b = -1). One corpus shuffle (the
    projected (id, text) rows partition by doc; the feature count agg,
    margin agg and id-spine join all reuse it — r14 optimization
    round), with the weight vector collected once and riding the plan
    as a B-double array literal instead of a broadcast join;
    documents with zero features keep their row at sigmoid(bias) via
    the left join's null margin. The model_df round-trips through
    parquet unchanged, so persisted models score identically to fresh
    ones.

    The hash modulus comes from the table itself: the b = -2
    sentinel if present, else max(b) + 1 — NEVER the count of
    nonnegative rows, which silently shifts the modulus on a
    filtered/compacted table. Either way the table must be DENSE
    (all buckets rows present, zeros included — what as_df writes);
    a pruned table raises. If the damping/hasher sentinels are
    present, a mismatching caller argument raises too."""
    # argument membership first: an unknown damping/hasher must raise
    # the descriptive error, not a KeyError out of the sentinel
    # comparison below (r12 ADVICE)
    if damping not in _DAMPING_CODE:
        raise ValueError(f"unknown damping: {damping!r}")
    if hasher not in _HASHER_CODE:
        raise ValueError(f"unknown hasher: {hasher!r}")
    # ONE model-bounded collect answers metadata, denseness and the
    # weight vector (the old shape ran three driver actions against
    # the same broadcast-sized table): a persisted model is
    # self-describing
    rows = model_df.collect()
    meta = {int(r.b): float(r.w) for r in rows if r.b < 0}
    wd = {int(r.b): float(r.w) for r in rows if r.b >= 0}
    nneg = sum(1 for r in rows if r.b >= 0)
    if -2 in meta:
        buckets = int(meta[-2])
    else:
        if not wd:
            raise ValueError(
                "empty weight table: no b >= 0 rows and no b = -2 "
                "bucket-count sentinel — score only tables written by "
                "LinearModel.as_df"
            )
        buckets = max(wd) + 1
    if nneg != buckets or len(wd) != buckets:
        raise ValueError(
            f"weight table is not dense: {nneg} rows for modulus "
            f"{buckets} — score only tables written by "
            "LinearModel.as_df (all buckets rows, zeros included); "
            "a filtered/compacted table would silently corrupt the "
            "bucket modulus"
        )
    for code, arg, table, what in (
        (-3, damping, _DAMPING_CODE, "damping"),
        (-4, hasher, _HASHER_CODE, "hasher"),
    ):
        if code in meta and meta[code] != table[arg]:
            trained = {v: k for k, v in table.items()}[meta[code]]
            raise ValueError(
                f"model was trained with {what}={trained!r} but "
                f"scoring was asked for {what}={arg!r} — scores "
                "would be silently wrong"
            )
    if -1 not in meta:
        raise ValueError(
            "weight table lacks its b = -1 intercept row — score only "
            "tables written by LinearModel.as_df"
        )
    base = docs.select(F.col(id_col), F.col(text_col)).repartition(
        id_col
    )
    warr = F.lit([wd[b] for b in range(buckets)])
    weighted = (
        hashed_features(base, buckets, id_col, text_col, hasher,
                        spread=False)
        .groupBy(id_col, "b")  # partitioning by id satisfies (id, b)
        .agg(F.count("*").cast("double").alias("cnt"))
        .groupBy(id_col)
        .agg(F.sum(
            F.element_at(warr, (F.col("b") + 1).cast("int"))
            * _damp(F.col("cnt"), damping)
        ).alias("m"))
    )
    return (
        base.select(id_col)
        .join(weighted, id_col, "left")
        .select(
            id_col,
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(
                    -(F.coalesce(F.col("m"), F.lit(0.0))
                      + F.lit(meta[-1]))
                ))
            ).alias("score"),
        )
    )


def classifier_margin_expr(model: LinearModel, text_col: str = "text",
                           hasher: str | None = None):
    """The model's margin as a PURE ROW EXPRESSION — no explode, no
    aggregation, no state — so a trained classifier can gate an
    unbounded stream (pipelines/streaming_curation.py) or sit inside
    any row-level predicate.

    Only exact for ``damping="none"`` models: the in-row form is
    sum over feature OCCURRENCES of w[bucket(f)], which equals the
    batch scorer's per-bucket sum exactly when x = cnt (a log-damped
    margin needs per-bucket counts, i.e. an aggregation) — a model
    trained with any other damping RAISES here instead of silently
    gating with wrong scores. ``hasher`` defaults to the one the
    model was trained with; passing a different one raises. The
    weight vector rides the plan as a B-element array literal (one
    CreateArray node — B is model-bounded, the same broadcast-sized
    argument as everywhere else this model appears)."""
    if model.damping != "none":
        raise ValueError(
            f"in-row margin is only exact for damping='none' models; "
            f"this model was trained with damping={model.damping!r} — "
            "use classifier_score (batch, aggregating) or retrain "
            "with damping='none' for stream gating"
        )
    if hasher is None:
        hasher = model.hasher
    elif hasher != model.hasher:
        raise ValueError(
            f"model was trained with hasher={model.hasher!r} but the "
            f"expression was asked for hasher={hasher!r}"
        )
    warr = F.array(*[F.lit(float(x)) for x in model.weights])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    m = F.size(toks) - 1
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, m), F.slice(toks, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    from .lm import md5_prefix60 as _md5

    if hasher == "md5":
        bucket = lambda f: _md5(f) % F.lit(model.buckets)  # noqa: E731
    elif hasher == "xxhash64":
        bucket = lambda f: F.pmod(  # noqa: E731
            F.xxhash64(f), F.lit(model.buckets)
        )
    else:
        raise ValueError(f"unknown hasher: {hasher!r}")
    return F.aggregate(
        feats,
        F.lit(float(model.bias)),
        lambda acc, f: acc + F.element_at(
            warr, (bucket(f) + 1).cast("int")
        ),
    )


def classifier_score_expr(model: LinearModel, text_col: str = "text",
                          hasher: str | None = None):
    """sigmoid(margin) as a row expression — the streaming gate's
    score column. Same exactness contract as classifier_margin_expr
    (damping="none" models only; both validated there)."""
    return F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-classifier_margin_expr(model, text_col, hasher))
    )


# ---------------------------------------------------------------------
# Multiclass softmax tier: trained language ID (the CCNet deployment
# shape — fastText-style linear lang-id over the same hashed
# unigram+bigram feature map). One softmax generalization of
# logreg_fit with the identical scale contract: per iteration the
# cluster moves O(B) rows (now carrying C accumulator columns), the
# driver collects a B x C gradient, and the model broadcasts for
# scoring. C (number of languages) is model-bounded and small.
# ---------------------------------------------------------------------


@dataclass(frozen=True)
class SoftmaxModel:
    """Trained multiclass weights: ``weights[c, b]`` per (class, hash
    bucket) plus per-class intercepts. ``classes`` is SORTED — class
    order is part of the model identity (tie-breaks resolve to the
    lexicographically smallest class)."""

    weights: np.ndarray  # shape (n_classes, buckets)
    biases: np.ndarray   # shape (n_classes,)
    classes: tuple[str, ...]
    buckets: int
    damping: str = "log"
    hasher: str = "xxhash64"

    def as_df(self, spark: SparkSession) -> DataFrame:
        """(cls, b, w) weight table: per class a DENSE b >= 0 block
        plus the intercept at b = -1; training config rides as
        cls = '' sentinel rows (b = -2 buckets, -3 damping code,
        -4 hasher code — class labels are never empty, enforced at
        fit). One parquet dataset carries the whole self-describing
        model, the LinearModel.as_df convention."""
        rows = []
        for i, c in enumerate(self.classes):
            rows += [(c, int(b), float(w))
                     for b, w in enumerate(self.weights[i])]
            rows.append((c, -1, float(self.biases[i])))
        rows.append(("", -2, float(self.buckets)))
        rows.append(("", -3, _DAMPING_CODE[self.damping]))
        rows.append(("", -4, _HASHER_CODE[self.hasher]))
        return local_df(spark, rows, "cls string, b long, w double")


def softmax_fit(docs: DataFrame, label_col: str, buckets: int = 512,
                iters: int = 30, lr: float = 0.5, l2: float = 1e-4,
                id_col: str = "doc_id", text_col: str = "text",
                hasher: str = "xxhash64",
                damping: str = "log",
                _feats: DataFrame | None = None) -> SoftmaxModel:
    """Fit softmax(bias_c + sum_b w[c, b] * x[d, b]) to the string
    ``label_col`` by full-batch gradient descent on the multiclass
    cross-entropy (fixed ``iters``, replay-identical work). The
    distributed shape (r14 optimization round — the rationale lives
    on _design_blocks): the design matrix is built with ONE corpus
    shuffle and cached as per-partition numpy CSR blocks; each
    iteration is a single treeAggregate whose tasks compute the
    max-shifted softmax residuals and a (B+1) x C partial gradient
    with vectorized numpy — no per-iteration broadcast build, no
    per-iteration codegen compile, no shuffle. Cluster traffic per
    iteration is the W closure down and one (B+1) x C partial per
    partition up. Null-label docs are EXCLUDED before n is counted
    (r13 ADVICE — they would silently dilute the effective learning
    rate). Reference-pinned against numpy in tests/test_classifier.py
    / tests/test_langid.py."""
    est = _plan_size(docs.select(F.col(id_col), F.col(text_col)))
    local = est is not None and est <= _LOCAL_FIT_MAX_BYTES
    if local:
        # driver-side Arrow block build — no Python-worker pass (see
        # _design_blocks_local); the fold below is unchanged
        blocks, blist = None, _design_blocks_local(
            docs, F.col(label_col).cast("string"), buckets, id_col,
            text_col, hasher, damping, feats=_feats,
        )
    else:
        blocks = _design_blocks(
            docs, F.col(label_col).cast("string"), buckets, id_col,
            text_col, hasher, damping, feats=_feats, persist=True,
        )
        blist = None
    try:
        # one job materializes the cache AND answers n + the class set
        def class_counts(blk):
            out: dict[str, int] = {}
            for y in blk[0]:
                if y is not None:
                    out[y] = out.get(y, 0) + 1
            return out

        def merge_counts(a, b):
            for k, v in b.items():
                a[k] = a.get(k, 0) + v
            return a

        if local:
            by_class: dict[str, int] = {}
            for blk in blist:
                merge_counts(by_class, class_counts(blk))
        else:
            by_class = blocks.map(class_counts).fold({}, merge_counts)
        n = sum(by_class.values())
        if n == 0:
            raise ValueError("no non-null labels")
        classes = sorted(by_class)
        if "" in classes:
            raise ValueError(
                "empty-string class label collides with the metadata "
                "sentinel rows — relabel"
            )
        C = len(classes)
        cls_index = {c: i for i, c in enumerate(classes)}
        W = np.zeros((C, buckets))
        biases = np.zeros(C)
        for _ in range(iters):
            def part_grad(acc, blk, W=W, biases=biases):
                # bincount == add.at bitwise (element-order adds),
                # ~10x faster — see logreg_fit's part_grad note
                GT, gb = acc  # GT is (buckets, C), gb length C
                ys, indptr, idx, vals = blk
                nd = len(ys)
                M = np.zeros((nd, C))
                if idx.size:
                    rows = np.repeat(
                        np.arange(nd), np.diff(indptr)
                    )
                    for c in range(C):
                        M[:, c] += np.bincount(
                            rows, weights=vals * W[c, idx],
                            minlength=nd,
                        )
                M += biases
                P = np.exp(M - M.max(axis=1)[:, None])
                P /= P.sum(axis=1)[:, None]
                # residual = softmax - onehot; null-label docs are
                # not in the blocks' gradient path (yi skips them)
                keep = np.array(
                    [y is not None for y in ys], dtype=bool
                )
                yi = np.fromiter(
                    (cls_index[y] for y in ys if y is not None),
                    dtype=np.int64, count=int(keep.sum()),
                )
                P[np.flatnonzero(keep), yi] -= 1.0
                if not keep.all():
                    P[~keep] = 0.0
                if idx.size:
                    for c in range(C):
                        GT[:, c] += np.bincount(
                            idx, weights=P[rows, c] * vals,
                            minlength=GT.shape[0],
                        )
                gb += P.sum(axis=0)
                return GT, gb

            if local:
                # same fold as treeAggregate(depth=1): fresh zero acc
                # per block, partials added in partition order
                GT, gb = np.zeros((buckets, C)), np.zeros(C)
                for blk in blist:
                    pGT, pgb = part_grad(
                        (np.zeros((buckets, C)), np.zeros(C)), blk
                    )
                    GT += pGT
                    gb += pgb
            else:
                # depth=1 — see logreg_fit: the depth-2 combine stage
                # cost ~2 s per 8 iterations at sf1 for (B+1)xC
                # partials
                GT, gb = blocks.treeAggregate(
                    (np.zeros((buckets, C)), np.zeros(C)), part_grad,
                    lambda a, b: (a[0] + b[0], a[1] + b[1]),
                    depth=1,
                )
            W -= lr * (GT.T / n + l2 * W)
            biases -= lr * (gb / n)
    finally:
        if not local:
            blocks.unpersist()
    return SoftmaxModel(W, biases, tuple(classes), buckets, damping,
                        hasher)


def langid_score(docs: DataFrame, model_df: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 hasher: str = "xxhash64",
                 damping: str = "log",
                 _feats: DataFrame | None = None) -> DataFrame:
    """(id_col, lang, prob): argmax class and its softmax probability
    per document from a persisted (cls, b, w) SoftmaxModel table —
    tie-break margin DESC then class ASC (deterministic). One
    broadcast-sized collect of the model, one join against a
    B-row wide weight table, one per-doc agg; softmax and argmax are
    pure row expressions over the C margin columns — no per-class row
    blowup, all codegen. A document with zero features scores on the
    biases alone (the left join's null margins). Same self-describing
    validation as classifier_score: sentinel config rows must match
    the caller's arguments, each class block must be DENSE."""
    if damping not in _DAMPING_CODE:
        raise ValueError(f"unknown damping: {damping!r}")
    if hasher not in _HASHER_CODE:
        raise ValueError(f"unknown hasher: {hasher!r}")
    rows = model_df.collect()  # model-bounded: C x (B + 1) + 3 rows
    meta = {int(r.b): float(r.w) for r in rows if r.cls == ""}
    if -2 not in meta:
        raise ValueError(
            "not a SoftmaxModel table: missing the cls='' b=-2 "
            "bucket-count sentinel (write with SoftmaxModel.as_df)"
        )
    buckets = int(meta[-2])
    for code, arg, table, what in (
        (-3, damping, _DAMPING_CODE, "damping"),
        (-4, hasher, _HASHER_CODE, "hasher"),
    ):
        if code in meta and meta[code] != table[arg]:
            trained = {v: k for k, v in table.items()}[meta[code]]
            raise ValueError(
                f"model was trained with {what}={trained!r} but "
                f"scoring was asked for {what}={arg!r} — scores "
                "would be silently wrong"
            )
    Wd: dict = {}
    biases: dict = {}
    for r in rows:
        if r.cls == "":
            continue
        if r.b == -1:
            biases[r.cls] = float(r.w)
        elif r.b >= 0:
            Wd.setdefault(r.cls, {})[int(r.b)] = float(r.w)
    # class set = union of weight-row and intercept-row labels: a
    # corrupt table where a class has ONLY its b=-1 intercept row must
    # trip the dense-block error below, not be silently dropped from
    # scoring (r13 ADVICE — the mirror of weights-without-intercept)
    classes = sorted(set(Wd) | set(biases))
    if not classes:
        raise ValueError("empty weight table: no class rows")
    for c in classes:
        if len(Wd.get(c, {})) != buckets or c not in biases:
            raise ValueError(
                f"class {c!r} block is not dense "
                f"({len(Wd.get(c, {}))} rows for modulus {buckets}) "
                "or lacks its b=-1 intercept — score only tables "
                "written by SoftmaxModel.as_df"
            )
    C = len(classes)
    # r14 optimization round: weights as C array literals indexed by
    # element_at (no per-call createDataFrame/BroadcastExchange), and
    # ONE corpus shuffle — the projected (id, text) rows partition by
    # doc up front, so the feature count agg, the margin agg and the
    # id-spine left join (zero-feature docs score on biases) all
    # reuse that exchange; the spine branch reuses it literally
    # (ReusedExchange in the plan). Old shape: separate (id, b) and
    # id exchanges of the exploded feature rows plus an un-partitioned
    # spine side for the final join.
    warr = [F.lit([Wd[c][b] for b in range(buckets)]) for c in classes]
    if _feats is None:
        base = docs.select(F.col(id_col), F.col(text_col)).repartition(
            id_col
        )
        feats = damped_features(base, buckets, id_col, text_col,
                                hasher, damping)
    else:
        # caller-shared design values (damped_features, typically the
        # same persisted table the fit consumed — q_langid): the
        # feature hash is not recomputed, and the id spine below
        # shuffles bare ids only
        base = docs.select(F.col(id_col)).repartition(id_col)
        feats = _feats
    margins = feats.groupBy(id_col).agg(*[
        F.sum(
            F.element_at(warr[i], (F.col("b") + 1).cast("int"))
            * F.col("x")
        ).alias(f"__m{i}")
        for i in range(C)
    ])
    j = base.select(id_col).join(margins, id_col, "left")
    mi = [
        F.coalesce(F.col(f"__m{i}"), F.lit(0.0))
        + F.lit(float(biases[classes[i]]))
        for i in range(C)
    ]
    mx = F.greatest(*mi) if C > 1 else mi[0]
    exps = [F.exp(m - mx) for m in mi]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    # first class (ASC) whose margin equals the max — margin-desc,
    # class-asc tie-break as one chained conditional
    winner = F.lit(classes[-1])
    winner_p = exps[-1] / denom
    for i in range(C - 2, -1, -1):
        hit = mi[i] == mx
        winner = F.when(hit, F.lit(classes[i])).otherwise(winner)
        winner_p = F.when(hit, exps[i] / denom).otherwise(winner_p)
    return j.select(
        id_col, winner.alias("lang"), winner_p.alias("prob")
    )


def langid_margin_exprs(model: SoftmaxModel, text_col: str = "text",
                        hasher: str | None = None) -> list:
    """Per-class margins as PURE ROW EXPRESSIONS — the multiclass
    analog of classifier_margin_expr, so a trained lang-id can gate
    an unbounded stream with zero state. Same exactness contract:
    only damping="none" models (the in-row form sums w[bucket(f)]
    over feature OCCURRENCES, which equals the batch scorer's
    per-bucket sum exactly when x = cnt); hasher defaults to the
    trained one and mismatches raise. Cost: C aggregate passes over
    the in-row feature array (the per-feature hash is recomputed per
    class — C is model-bounded and small, and HOF lambdas have no
    common-subexpression elimination, so a shared-hash form would
    not actually share it)."""
    if model.damping != "none":
        raise ValueError(
            f"in-row margins are only exact for damping='none' "
            f"models; this model was trained with "
            f"damping={model.damping!r} — use langid_score (batch, "
            "aggregating) or retrain with damping='none' for stream "
            "gating"
        )
    if hasher is None:
        hasher = model.hasher
    elif hasher != model.hasher:
        raise ValueError(
            f"model was trained with hasher={model.hasher!r} but the "
            f"expression was asked for hasher={hasher!r}"
        )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    m = F.size(toks) - 1
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, m), F.slice(toks, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    from .lm import md5_prefix60 as _md5

    if hasher == "md5":
        bucket = lambda f: _md5(f) % F.lit(model.buckets)  # noqa: E731
    elif hasher == "xxhash64":
        bucket = lambda f: F.pmod(  # noqa: E731
            F.xxhash64(f), F.lit(model.buckets)
        )
    else:
        raise ValueError(f"unknown hasher: {hasher!r}")
    def _margin(warr, bias):
        # a closure (not a default arg: pyspark reads the lambda's
        # ARITY to bind higher-order-function variables)
        return F.aggregate(
            feats,
            F.lit(bias),
            lambda acc, f: acc + F.element_at(
                warr, (bucket(f) + 1).cast("int")
            ),
        )

    return [
        _margin(
            F.array(*[F.lit(float(x)) for x in model.weights[i]]),
            float(model.biases[i]),
        )
        for i in range(len(model.classes))
    ]


def langid_expr(model: SoftmaxModel, text_col: str = "text",
                hasher: str | None = None):
    """The argmax language as ONE ROW EXPRESSION (margin DESC, class
    ASC tie-break — identical to langid_score's): the stateless
    streaming form of the trained lang-id gate. Exactness contract
    as langid_margin_exprs (damping="none" only; in-row == batch
    argmax pinned in tests/test_langid.py)."""
    mi = langid_margin_exprs(model, text_col, hasher)
    classes = list(model.classes)
    mx = F.greatest(*mi) if len(mi) > 1 else mi[0]
    winner = F.lit(classes[-1])
    for i in range(len(classes) - 2, -1, -1):
        winner = F.when(mi[i] == mx, F.lit(classes[i])).otherwise(winner)
    return winner
