"""Deduplication operator family (north-star C10/C11; SURVEY.md §2C).

Four tiers, in increasing tolerance for fuzz and decreasing cost
precision:

- exact          hash group-by on the content key (or md5 of it)
- n-gram Jaccard exact pairwise similarity via a shingle self-join —
                 the ground truth the fuzzy tiers approximate
- MinHash + LSH  shingle -> k minhashes -> banded signatures ->
                 bucket join -> exact verify of candidates only
- SimHash        64-bit weighted fingerprint; near-dups = pairs within
                 a Hamming ball

Everything is built-in Spark expressions (xxhash64, transform,
aggregate, bit ops) — no Python in the pipeline.

Scale notes (the whole point of the tiers): exact Jaccard's shingle
self-join explodes quadratically inside hot shingle groups; at 100 TB
only the LSH path survives — its cost is O(docs x bands) shuffle plus
exact verification of the (tiny) candidate set. Banding keeps recall:
with k=32 hashes in b=8 bands of r=4, a pair at Jaccard 0.8 collides
in >=1 band with p = 1-(1-0.8^4)^8 ~ 0.98; at 0.3, p ~ 0.06. Stop-
shingle skew (a shingle shared by millions of docs) is the LSH
equivalent of join skew — the blocked pair joins take ``max_bucket``
to quarantine over-populated buckets before the self-join (ledgers:
lsh_hot_buckets / simhash_hot_buckets), mirroring winnowing's
``max_df`` stop-fingerprint drop and what AQE skew-split does for
joins.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles

# Production default for the blocked pair joins' hot-bucket cap
# (lsh_candidate_pairs / minhash_lsh_dedup_pairs / simhash_pairs /
# simhash_pairs_hmsearch): matches pipelines/curation.py's
# CurationConfig.lsh_max_bucket. A 5000-doc bucket already contributes
# ~12.5M candidate pairs; anything hotter is template skew that must be
# quarantined (audit via the *_hot_buckets ledgers), not self-joined.
# Callers that need the exact uncapped semantics (oracles, ground-truth
# comparisons) pass max_bucket=None explicitly.
DEFAULT_MAX_BUCKET = 5000

# Sentinel distinguishing "caller said nothing" (-> DEFAULT_MAX_BUCKET,
# read at CALL time so tests can exercise the default path on small
# engineered-skew corpora) from an explicit None (uncapped). A typed
# singleton (not a bare object()) so the public signatures
# `int | None | _CapDefault` type-check honestly.
class _CapDefault:
    __slots__ = ()

    def __repr__(self) -> str:  # renders in API docs / reprs
        return "DEFAULT_MAX_BUCKET"


_CAP_DEFAULT = _CapDefault()


def _resolve_cap(max_bucket: "int | None | _CapDefault") -> int | None:
    return DEFAULT_MAX_BUCKET if max_bucket is _CAP_DEFAULT else max_bucket


# Cache lifecycle: the fuzzy tiers persist() intermediate shingle/token
# tables that the returned (lazy) plan consumes later, so they cannot
# unpersist internally. Each handle is tracked here; long-lived hosts
# (the Flight server, notebook sessions) call release_caches() after
# the consuming action. Short-lived driver runs leak nothing — the
# session teardown drops the blocks.
_CACHES: list[DataFrame] = []


def _persisted(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every cached intermediate created by this module since
    the last release; returns the number of handles released.

    blocking=True: the default async unpersist leaves blocks resident
    while the NEXT query runs — in a back-to-back workload (bench
    loops, a busy Flight server) that storage pressure starves
    execution memory and measured as multi-x slowdowns of unrelated
    queries after a cache-heavy one."""
    n = 0
    while _CACHES:
        _CACHES.pop().unpersist(blocking=True)
        n += 1
    return n


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shs: array<string> DISTINCT shingles, sz) — deduped with
    array_distinct BEFORE any explode, so downstream consumers get
    distinct (id, shingle) rows without a distinct() shuffle, and the
    set size rides along instead of needing its own aggregation."""
    # Two deliberate plan choices:
    # 1. repartition: a small corpus often arrives as ONE parquet
    #    row-group -> one partition -> single-threaded compute; the
    #    round-robin shuffle of (id, toks) is far cheaper than
    #    serializing the per-row-heavy shingle work.
    # 2. tokenize BEFORE the exchange: the exchange is a projection
    #    barrier CollapseProject can't cross, so split(lower(text))
    #    runs exactly once per row and the shingle expression operates
    #    on a materialized attribute instead of re-evaluating the
    #    split inside every slice.
    toked = docs.select(
        id_col, tokens(text_col).alias("__toks")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    shs = F.array_distinct(word_shingles(F.col("__toks"), n))
    return toked.select(
        id_col, shs.alias("shs")
    ).withColumn("sz", F.size("shs"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs; the input to every fuzzy tier."""
    return shingle_sets(docs, id_col, text_col, n).select(
        id_col, F.explode("shs").alias("shingle")
    )


def exact_dedup(docs: DataFrame, key_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct key, keeping the smallest id
    (deterministic, unlike dropDuplicates' arbitrary winner). Output:
    (keep_id, n_copies, key_hash)."""
    return docs.groupBy(key_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
    ).select(
        "keep_id", "n_copies", F.md5(F.col(key_col)).alias("text_hash")
    )


def _verify_pairs(cands: DataFrame, sets: DataFrame, threshold: float,
                  id_col: str) -> DataFrame:
    """Exact Jaccard verification of candidate (d1, d2) pairs against
    the materialized shingle-set table: two equi-joins on doc id bring
    in both (distinct) shingle arrays, the intersection is computed
    in-row with array_intersect — no exploded-shingle shuffle, no
    count aggregation. The candidate set is small by construction, so
    AQE turns both joins into broadcasts at runtime; at warehouse scale
    they degrade gracefully to shuffle joins keyed on doc id."""
    s1 = sets.select(F.col(id_col).alias("d1"), F.col("shs").alias("shs1"),
                     F.col("sz").alias("sz1"))
    s2 = sets.select(F.col(id_col).alias("d2"), F.col("shs").alias("shs2"),
                     F.col("sz").alias("sz2"))
    inter = F.size(F.array_intersect("shs1", "shs2"))
    return (
        cands.join(s1, "d1").join(s2, "d2")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Exact pairwise n-gram Jaccard >= threshold via shingle self-join
    with map-side-partial pair aggregation. Output (d1, d2, jaccard)
    with d1 < d2. Ground truth for the LSH tier; quadratic in
    co-shingled docs — small/medium scale only (the LSH tier is the
    100 TB path).

    Why NOT PPJoin prefix filtering here: measured on this corpus at
    t=0.3, hash-ordered prefixes keep 70% of shingles and hot shingles
    make candidate DISTINCT pairs ~726k against 256 real pairs — the
    per-pair array_intersect verify then dwarfs the count aggregation
    it replaced (14s vs 4s end-to-end). Prefix filtering only pays at
    high thresholds (t>=0.7 prunes 70%+ of the join input) or with a
    rarest-first global order (needs a shingle-frequency pass); the
    count aggregation keeps one shuffle and partial aggregation
    regardless of threshold. The length filter (t*max(sz) <= min(sz))
    IS kept in the join condition — it is free."""
    # persist the ARRAYS, not the exploded rows: Generate(explode)
    # re-evaluates its generator expression once per OUTPUT element,
    # so exploding an unmaterialized shingle expression costs
    # O(shingles x expr) — cache first, explode the cached attribute.
    # (Also shares the shingle pipeline across both join sides; at
    # warehouse scale this is the materialized shingle table.)
    t = float(threshold)
    sets = _persisted(shingle_sets(docs, id_col, text_col, n))
    sh = sets.select(id_col, "sz", F.explode("shs").alias("shingle"))
    a = sh.alias("a")
    b = sh.alias("b")
    # set sizes ride through the shingle join -> ONE shuffle for the
    # pair aggregation, no separate sizes joins
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.sz") >= F.lit(t) * F.col("b.sz"))
            & (F.col("b.sz") >= F.lit(t) * F.col("a.sz")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz1"),
            F.first("b.sz").alias("sz2"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def _sig_expr(shs: Column, num_hashes: int) -> Column:
    """In-row MinHash signature over a (distinct) shingle array: for
    each seed i, min over shingles of xxhash64(shingle, i). Pure
    nested higher-order functions — the signature never leaves the
    row, so signature computation costs ZERO shuffle (the older
    explode + k-min-aggregates shape paid a full (doc, shingle) hash
    exchange for the same arithmetic; measured 8.2 s -> see BASELINE
    at sf1). Empty shingle arrays yield an all-null signature; such
    docs band to shared null buckets, and verification discards them
    (Jaccard with an empty set never reaches a positive threshold)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shs, lambda s: F.xxhash64(s, i))),
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 32,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per doc. Output
    (id, sig: array<bigint> of length num_hashes); value-identical to
    the explode+groupBy formulation (same xxhash64(shingle, seed)
    stream), minus its shuffle."""
    sets = shingle_sets(docs, id_col, text_col, n)
    return sets.select(id_col, _sig_expr(F.col("shs"), num_hashes).alias("sig"))


def banded_signatures(signatures: DataFrame, bands: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """(id, band, bucket) rows: the signature split into ``bands``
    slices, each hashed to one bucket value. This is THE bucket
    derivation — the pair join (lsh_candidate_pairs) and the
    persistent index (operators/incremental.py) both call it, so an
    indexed corpus and a fresh batch always band identically."""
    return signatures.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b,
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                "sig",
                                b * (F.size("sig") / bands).cast("int") + 1,
                                (F.size("sig") / bands).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                    ),
                ),
            )
        ).alias("band", "bucket"),
    )


def hot_buckets(keyed: DataFrame, key_cols: list[str],
                max_bucket: int) -> DataFrame:
    """Quarantine ledger: one row per blocking-key bucket holding more
    than ``max_bucket`` members, with its population (``n_docs``).
    A bucket of m docs contributes m^2/2 candidate pairs to the
    blocked self-joins below, so buckets past the cap are exactly the
    quadratic skew that must be excluded at scale — this is the
    shingle-tier mirror of winnowing's ``max_df`` stop-fingerprint
    drop (operators/winnowing.py). The ledger is what you audit: a
    template-heavy corpus shows up here as a few enormous buckets, and
    the honest follow-up is an exact-dedup or template-strip pass over
    their members, not a silent drop."""
    return keyed.groupBy(*key_cols).agg(
        F.count("*").alias("n_docs")
    ).where(F.col("n_docs") > max_bucket)


def _drop_hot_buckets(keyed: DataFrame, key_cols: list[str],
                      max_bucket: int | None) -> DataFrame:
    """Exclude rows in over-cap buckets before a blocked self-join,
    as an IN-STREAM window count on the join key: count(*) over
    (partition by key) then filter. One evaluation of the (expensive)
    upstream pipeline and one exchange — which hash-partitions by
    exactly the self-join's key, so the join downstream reuses it
    instead of re-shuffling. The first-cut groupBy + anti-join shape
    re-evaluated the signature pipeline per consumer and broke the
    self-join's exchange reuse (measured +3 s on the sf0.1 funnel);
    this shape measured cheaper than even the uncapped join's two
    independent scans."""
    if max_bucket is None:
        return keyed
    if max_bucket < 2:
        raise ValueError(
            f"max_bucket < 2 would quarantine every colliding bucket "
            f"and emit zero pairs, got {max_bucket}"
        )
    # Persist the keyed rows: the hot-bucket count and the downstream
    # self-join all consume them, and unpersisted each consumer
    # re-runs the whole signature pipeline — the first-cut unpersisted
    # anti-join measured +3 s on the sf0.1 funnel, and an in-stream
    # window-count variant paid two WindowExec sort passes (+1.2 s on
    # the pair op). Persist + groupBy count + broadcast anti-join of
    # the (tiny, pathological-only) hot set measured at parity with
    # the uncapped join. Skip the persist when the caller already
    # persisted (e.g. ingest_batch's banded signatures).
    lvl = keyed.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        keyed = _persisted(keyed)
    hot = hot_buckets(keyed, key_cols, max_bucket)
    return keyed.join(
        F.broadcast(hot.select(*key_cols)), key_cols, "left_anti"
    )


def lsh_hot_buckets(signatures: DataFrame, bands: int = 8,
                    id_col: str = "doc_id",
                    max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """(band, bucket, n_docs) for every LSH band bucket whose
    population exceeds ``max_bucket`` — the ledger of what
    ``lsh_candidate_pairs(max_bucket=...)`` quarantined, derived from
    the same banding so the two always agree."""
    return hot_buckets(
        banded_signatures(signatures, bands, id_col),
        ["band", "bucket"], max_bucket,
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8,
                        id_col: str = "doc_id",
                        max_bucket: int | None | _CapDefault = _CAP_DEFAULT) -> DataFrame:
    """Band the signature (rows_per_band = len/bands), hash each band,
    and emit candidate pairs sharing any (band, band_hash) bucket.
    Output (d1, d2) distinct, d1 < d2.

    ``max_bucket`` caps in-bucket population BEFORE the self-join:
    a band bucket shared by m docs yields m^2/2 candidates, and a
    template-heavy corpus (boilerplate pages differing by one token)
    concentrates thousands of docs in single buckets — the quadratic
    skew that kills this join at 100 TB even after exact-dedup.
    Over-cap buckets are quarantined wholesale (audit them with
    :func:`lsh_hot_buckets`); a pair can still surface via any OTHER
    band it collides in, so recall degrades gracefully rather than
    cliffing. Defaults to :data:`DEFAULT_MAX_BUCKET` (the bounded
    production path); pass an explicit ``None`` for the exact uncapped
    semantics (ground truth / oracle comparisons)."""
    max_bucket = _resolve_cap(max_bucket)
    banded = _drop_hot_buckets(
        banded_signatures(signatures, bands, id_col),
        ["band", "bucket"], max_bucket,
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("d1"), F.col(f"r.{id_col}").alias("d2")
        )
        .distinct()
    )


def minhash_lsh_dedup_pairs(docs: DataFrame, threshold: float = 0.5,
                            num_hashes: int = 32, bands: int = 8,
                            id_col: str = "doc_id", text_col: str = "text",
                            n: int = 3, max_bucket: int | None | _CapDefault = _CAP_DEFAULT,
                            _sets: DataFrame | None = None) -> DataFrame:
    """Full LSH near-dup pipeline: candidates from banded MinHash, then
    EXACT Jaccard verification of candidates only. Output
    (d1, d2, jaccard) — a (high-recall) subset of ngram_jaccard_pairs.

    The shingle sets are computed once and persisted — signatures and
    verification both read them (at warehouse scale this is the
    materialize-the-shingle-table step of a multi-job pipeline).
    Verification joins the (tiny) candidate pairs back to the shingle
    ARRAYS and intersects in-row (_verify_pairs) rather than
    re-shuffling the exploded shingle table.

    ``max_bucket`` (see :func:`lsh_candidate_pairs`) is the hot-bucket
    cap, on by default (:data:`DEFAULT_MAX_BUCKET`) — pass ``None``
    explicitly for exact uncapped semantics; pipelines/curation.py
    passes its configured cap through here."""
    # Signature shape choice: the banding step posexplodes the
    # signature, and Generate re-evaluates its generator once per
    # output element — an UNMATERIALIZED in-row signature (_sig_expr)
    # would recompute the full k-hash MinHash per band per row
    # (measured 4x slower at sf1), and persisting it instead costs an
    # extra materialization pass (1.5x slower cold). The explode +
    # k-min-aggregates shape pays one (doc, shingle) shuffle but its
    # aggregate IS the exchange barrier the banding needs — cheapest
    # end-to-end of the shapes measured. The k hashes are k DIRECT
    # codegen'd aggregate expressions min(xxhash64(shingle, i)) — not
    # a per-row transform() into an hs array first: the lambda runs
    # interpreted per exploded row and measured 1.7x slower at sf1
    # for bit-identical output.
    # _sets lets a host pipeline (e.g. the curation funnel, whose
    # decontamination stage needs the same shingle table) inject an
    # already-persisted shingle-set table instead of re-tokenizing
    sets = _sets if _sets is not None else _persisted(
        shingle_sets(docs, id_col, text_col, n)
    )
    sigs = agg_signatures(sets, num_hashes, id_col)
    cands = lsh_candidate_pairs(sigs, bands, id_col, max_bucket)
    return _verify_pairs(cands, sets, threshold, id_col)


def agg_signatures(sets: DataFrame, num_hashes: int = 32,
                   id_col: str = "doc_id") -> DataFrame:
    """MinHash signatures from a shingle-set table via explode + k
    direct codegen'd min-aggregates — the measured-cheapest shape when
    a downstream banding explode follows (see the shape notes in
    minhash_lsh_dedup_pairs). Value-identical to the in-row _sig_expr
    stream; shared by the one-shot pipeline and the persistent index
    (operators/incremental.py) so both produce identical signatures."""
    sh = sets.select(id_col, F.explode("shs").alias("shingle"))
    return sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    ).select(
        id_col,
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              hash_fn: Callable[[Column], Column] | None = None) -> DataFrame:
    """64-bit SimHash over unigram tokens: for each bit, sum +-1 of the
    token hashes' bit values; fingerprint bit = 1 iff the sum > 0.
    Output (id, simhash: bigint). Pairwise near-dups = small Hamming
    distance (bit_count(a XOR b)).

    ``hash_fn`` defaults to xxhash64 (production tier); pass
    ``functions.hashing.md5_prefix60`` for the cross-engine bridge
    tier the DuckDB oracle can replicate bit-for-bit (its top 4 bits
    are always 0, which only means those fingerprint bits never vote).

    Shape: hash each token ONCE into a materialized column, then 64
    conditional-sum aggregates in a single groupBy (one shuffle with
    map-side partials) — not a 64x posexplode row blowup, and the
    token hash is an attribute so nothing re-evaluates per bit."""
    hash_fn = hash_fn or (lambda c: F.xxhash64(c))
    toked = _persisted(
        docs.select(id_col, tokens(text_col).alias("__toks")).repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
    )
    hashed = toked.select(
        id_col, F.explode("__toks").alias("tok")
    ).select(id_col, hash_fn(F.col("tok")).alias("h"))

    def bit_sum(bit: int) -> Column:
        is_set = F.call_function(
            "shiftright", F.col("h"), F.lit(bit)
        ).bitwiseAND(F.lit(1)) == 1
        return F.sum(F.when(is_set, 1).otherwise(-1))

    sums = hashed.groupBy(id_col).agg(
        *[bit_sum(b).alias(f"s{b}") for b in range(64)]
    )
    fingerprint = reduce(
        lambda acc, b: acc + F.when(
            F.col(f"s{b}") > 0, F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("long")
        ).otherwise(F.lit(0).cast("long")),
        range(64),
        F.lit(0).cast("long"),
    )
    return sums.select(id_col, fingerprint.alias("simhash"))


def _chunk_bounds(n_chunks: int) -> list[tuple[int, int]]:
    """(lo_bit, width) per chunk: disjoint, covering all 64 bits — the
    last chunk absorbs the 64 % n_chunks remainder (an uncovered bit
    would break the pigeonhole guarantee)."""
    width = 64 // n_chunks
    return [
        (c * width, width if c < n_chunks - 1 else 64 - c * width)
        for c in range(n_chunks)
    ]


def _chunk_expr(lo: int, w: int, fp_col: str = "simhash") -> Column:
    if w >= 64:  # the whole fingerprint is the key
        return F.col(fp_col)
    # arithmetic shiftright sign-fills the high bits; the mask
    # strips them, so the top chunk is still exact
    return F.call_function(
        "shiftright", F.col(fp_col), F.lit(lo)
    ).bitwiseAND(F.lit((1 << w) - 1))


def fingerprint_chunks(fps: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id",
                       fp_col: str = "simhash") -> DataFrame:
    """(id, <fp_col>, chunk_idx, chunk) blocking rows over ANY
    precomputed 64-bit fingerprint column — the shared derivation of
    :func:`fingerprint_pairs`' join and
    :func:`fingerprint_hot_buckets`' ledger, so cap and join always
    agree on bucket membership. Fingerprint producers: text SimHash
    (:func:`simhash64`), image perceptual hashes
    (multimodal/neardup.py), or anything else that encodes similarity
    as small Hamming distance."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    bounds = _chunk_bounds(max_hamming + 1)
    return fps.select(
        id_col, fp_col,
        F.posexplode(
            F.array(*[_chunk_expr(lo, w, fp_col) for lo, w in bounds])
        ).alias("chunk_idx", "chunk"),
    )


def fingerprint_hot_buckets(fps: DataFrame, max_hamming: int = 3,
                            max_bucket: int = DEFAULT_MAX_BUCKET,
                            id_col: str = "doc_id",
                            fp_col: str = "simhash") -> DataFrame:
    """(chunk_idx, chunk, n_docs) for every fingerprint blocking
    bucket past ``max_bucket`` — the quarantine ledger twin of
    ``fingerprint_pairs(max_bucket=...)``."""
    return hot_buckets(
        fingerprint_chunks(fps, max_hamming, id_col, fp_col),
        ["chunk_idx", "chunk"], max_bucket,
    )


def fingerprint_pairs(fps: DataFrame, max_hamming: int = 3,
                      id_col: str = "doc_id", fp_col: str = "simhash",
                      max_bucket: int | None | _CapDefault = _CAP_DEFAULT) -> DataFrame:
    """Near-dup pairs within a Hamming radius over ANY precomputed
    64-bit fingerprint column, chunk-blocked (see :func:`simhash_pairs`
    for the pigeonhole argument, scale envelope, and cap semantics —
    this is its generic core, shared with the image perceptual-hash
    tier in multimodal/neardup.py). Output (d1, d2, hamming)."""
    max_bucket = _resolve_cap(max_bucket)
    chunks = _drop_hot_buckets(
        fingerprint_chunks(fps, max_hamming, id_col, fp_col),
        ["chunk_idx", "chunk"], max_bucket,
    )
    l = chunks.alias("l")
    r = chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("d1"),
            F.col(f"r.{id_col}").alias("d2"),
            F.col(f"l.{fp_col}").alias("h1"),
            F.col(f"r.{fp_col}").alias("h2"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def simhash_chunks(docs: DataFrame, max_hamming: int = 3,
                   id_col: str = "doc_id", text_col: str = "text",
                   hash_fn: Callable[[Column], Column] | None = None
                   ) -> DataFrame:
    """(id, simhash, chunk_idx, chunk) blocking rows — the shared
    derivation of :func:`simhash_pairs`' join and
    :func:`simhash_hot_buckets`' ledger, so cap and join always agree
    on bucket membership."""
    return fingerprint_chunks(
        simhash64(docs, id_col, text_col, hash_fn), max_hamming, id_col
    )


def simhash_hot_buckets(docs: DataFrame, max_hamming: int = 3,
                        max_bucket: int = DEFAULT_MAX_BUCKET,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_fn: Callable[[Column], Column] | None = None
                        ) -> DataFrame:
    """(chunk_idx, chunk, n_docs) for every SimHash blocking bucket
    past ``max_bucket`` — the quarantine ledger twin of
    ``simhash_pairs(max_bucket=...)``."""
    return hot_buckets(
        simhash_chunks(docs, max_hamming, id_col, text_col, hash_fn),
        ["chunk_idx", "chunk"], max_bucket,
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  hash_fn: Callable[[Column], Column] | None = None,
                  max_bucket: int | None | _CapDefault = _CAP_DEFAULT) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, BLOCKED on
    signature chunks: the 64 bits split into ``max_hamming + 1``
    disjoint chunks, so a pair within the radius must agree EXACTLY on
    >= 1 chunk (pigeonhole — exact for ANY radius, not just 3), and
    the join is a bucket equi-join on (chunk_idx, chunk value)
    followed by an in-row bit_count(xor) verify of the candidates.
    Defaults give the classic 4 x 16-bit layout for Hamming <= 3; a
    looser radius just yields more, narrower chunks (e.g. 8 x 8-bit
    for <= 7) with correspondingly denser buckets.

    Scale envelope: with uniform fingerprints and chunk width w,
    expected candidate volume is ~(max_hamming+1) N^2 / 2^w —
    negligible to ~10^6-10^7 docs at w=16, after which switch to
    :func:`simhash_pairs_hmsearch` (pair-of-chunks keys, still
    pigeonhole-exact, ~2^w fewer candidates) and set ``max_bucket``
    to cap pathologically dense buckets the way the shingle tiers cap
    stop-shingles (template-heavy corpora concentrate mass on few
    chunk values): over-cap (chunk_idx, chunk) buckets are quarantined
    wholesale before the join (ledger: :func:`simhash_hot_buckets`);
    in-radius pairs can still surface through any other chunk they
    agree on, so the exactness loss is bounded to pairs ALL of whose
    agreeing chunks are hot. Defaults to :data:`DEFAULT_MAX_BUCKET`
    (bounded production path); pass an explicit ``None`` for the exact
    pigeonhole semantics."""
    return fingerprint_pairs(
        simhash64(docs, id_col, text_col, hash_fn),
        max_hamming, id_col, "simhash", max_bucket,
    )


def simhash_pairs_hmsearch(docs: DataFrame, max_hamming: int = 3,
                           n_chunks: int | None = None,
                           id_col: str = "doc_id", text_col: str = "text",
                           hash_fn: Callable[[Column], Column] | None = None,
                           max_bucket: int | None | _CapDefault = _CAP_DEFAULT) -> DataFrame:
    """:func:`simhash_pairs` with HmSearch-style WIDENED blocking keys
    for >10^7-doc corpora — same output, ~2^w fewer candidates.

    Generalized pigeonhole: split the 64 bits into ``n_chunks`` = m
    disjoint chunks with m - max_hamming >= 2. At most ``max_hamming``
    chunks can differ between two fingerprints within the radius, so
    at least m - max_hamming >= 2 chunks agree exactly — hence some
    PAIR of chunks agrees, and blocking on all C(m, 2) ordered chunk
    pairs (key = (pair_idx, chunk_i, chunk_j)) is still exact. The
    key is ~2x wider than the single-chunk tier's, so with uniform
    fingerprints expected candidate volume drops from
    ~(k+1) N^2 / 2^w to ~C(m,2) N^2 / 2^(2w') (w' = 64/m): at k=3,
    N=10^8, that is ~6x10^11 candidates for the 4x16 layout vs
    ~3x10^9 for the default 5-chunk pair layout — the difference
    between an impossible shuffle and a large-but-plannable one. Cost:
    C(m,2) key rows per doc instead of m (10 vs 4 at the defaults).

    Defaults: n_chunks = max_hamming + 2 (the minimum m that admits
    pair keys, which maximizes chunk width and thus selectivity).

    ``max_bucket`` quarantines over-populated (pair_idx, chunk_i,
    chunk_j) buckets exactly as in :func:`simhash_pairs` — the wider
    keys make hot buckets rarer, but a template corpus can still
    saturate one. Defaults to :data:`DEFAULT_MAX_BUCKET`; explicit
    ``None`` for exact."""
    max_bucket = _resolve_cap(max_bucket)
    if n_chunks is None:
        n_chunks = max_hamming + 2
    if not 0 <= max_hamming <= 62:
        raise ValueError(f"max_hamming must be in [0, 62], got {max_hamming}")
    if n_chunks - max_hamming < 2:
        raise ValueError(
            f"need n_chunks - max_hamming >= 2 for pair blocking to be "
            f"exact, got n_chunks={n_chunks}, max_hamming={max_hamming}"
        )
    if n_chunks > 64:
        raise ValueError(f"n_chunks must be <= 64, got {n_chunks}")
    bounds = _chunk_bounds(n_chunks)

    from itertools import combinations

    chunk_cols = [_chunk_expr(lo, w) for lo, w in bounds]
    pair_keys = F.array(
        *[
            F.struct(
                F.lit(p).alias("pk"), c1.alias("k1"), c2.alias("k2")
            )
            for p, (c1, c2) in enumerate(combinations(chunk_cols, 2))
        ]
    )
    sh = simhash64(docs, id_col, text_col, hash_fn)
    keyed = sh.select(
        id_col, "simhash", F.explode(pair_keys).alias("key")
    ).select(id_col, "simhash", "key.pk", "key.k1", "key.k2")
    keyed = _drop_hot_buckets(keyed, ["pk", "k1", "k2"], max_bucket)
    l = keyed.alias("l")
    r = keyed.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.pk") == F.col("r.pk"))
            & (F.col("l.k1") == F.col("r.k1"))
            & (F.col("l.k2") == F.col("r.k2"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("d1"),
            F.col(f"r.{id_col}").alias("d2"),
            F.col("l.simhash").alias("h1"),
            F.col("r.simhash").alias("h2"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def ngram_containment_pairs(docs: DataFrame, threshold: float,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            n: int = 3) -> DataFrame:
    """DIRECTED exact n-gram containment pairs: (src, dst,
    containment) where C(src -> dst) = |S_src ∩ S_dst| / |S_src| >=
    threshold — src's shingle set is (mostly) inside dst's. The
    asymmetric complement of :func:`ngram_jaccard_pairs`: a short
    document quoted whole inside a long one has containment ~1.0 but
    Jaccard ~|small|/|large| -> 0, so symmetric near-dup tiers miss
    it entirely (the quoted-extract / partial-copy case winnowing
    detects positionally; this is the set-semantics ground truth).

    Same single-shuffle machinery as the Jaccard tier — one shingle
    self-join with the pair count aggregated map-side — with the
    DIRECTED free length filter in the join condition: C(a -> b) >= t
    needs |S_b| >= t * |S_a| (inter <= |S_b|), kept in either
    direction so the join admits a pair when at least one direction
    can still pass. Both passing directions emit (a pair of exact
    copies yields both rows). Quadratic in co-shingled docs like the
    Jaccard tier — this is the oracle-checkable ground truth.

    SCALE DISPOSITION (the 100 TB path for short-in-long
    duplication): there is NO containment analog of MinHash banding —
    LSH over min-hash signatures estimates the SYMMETRIC Jaccard, and
    a short doc inside a long one has J -> 0, so the banded tier will
    (correctly, per its own contract) not propose the pair. The
    blocked path for this duplication class is the WINNOWING
    fingerprint tier (operators/winnowing.py + the persistent
    fp_index): winnowing selects rolling-hash minima positionally, so
    a quoted span contributes the SAME fingerprints to both
    documents regardless of the length ratio, and the df-capped
    fingerprint equi-join surfaces the pair at corpus scale. Use
    winnowing to block candidates, this operator to confirm exact
    containment on the candidate set when the set-semantics ratio is
    the needed verdict."""
    t = float(threshold)
    sets = _persisted(shingle_sets(docs, id_col, text_col, n))
    sh = sets.select(id_col, "sz", F.explode("shs").alias("shingle"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                (F.col("b.sz") >= F.lit(t) * F.col("a.sz"))
                | (F.col("a.sz") >= F.lit(t) * F.col("b.sz"))
            ),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
        )
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz1"),
            F.first("b.sz").alias("sz2"),
        )
    )
    fwd = (
        inter.where(F.col("inter") / F.col("sz1") >= t)
        .select(
            F.col("d1").alias("src"),
            F.col("d2").alias("dst"),
            (F.col("inter") / F.col("sz1")).alias("containment"),
        )
    )
    rev = (
        inter.where(F.col("inter") / F.col("sz2") >= t)
        .select(
            F.col("d2").alias("src"),
            F.col("d1").alias("dst"),
            (F.col("inter") / F.col("sz2")).alias("containment"),
        )
    )
    return fwd.unionByName(rev)
