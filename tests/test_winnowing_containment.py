"""containment_pairs_blocked (operators/winnowing.py): the composed
100 TB path for short-in-long duplication — winnowing fingerprints
propose, the exact directed shingle ratio confirms. Pinned against
the brute-force ground truth (operators/dedup.py:
ngram_containment_pairs) on planted short-in-long corpora: quoted
extracts are recovered near-completely, precision is exact by
construction, and scattered (span-free) containment is documented
as invisible to the propose stage. Closes the r12 scale disposition
(SURVEY C11) with a real operator."""

from __future__ import annotations

import random

from web3_flight_rpc_server_spark.operators.dedup import (
    ngram_containment_pairs,
)
from web3_flight_rpc_server_spark.operators.winnowing import (
    containment_pairs_blocked,
)

THRESHOLD = 0.4


def _make_planted(seed: int):
    """Background of random-word docs plus two planted classes:
    'quote' (a 12-word contiguous span extracted whole — containment
    1.0) and 'half' (an 8-word span plus 8 unique pad words —
    containment ~0.43). Returns (rows, quote_pairs, half_pairs) with
    pairs as (src_short_id, dst_long_id)."""
    rng = random.Random(seed)
    vocab = [f"tok{i:03d}" for i in range(800)]
    rows, quote_pairs, half_pairs = [], [], []
    nid = 0

    def _long_doc():
        nonlocal nid
        words = [rng.choice(vocab) for _ in range(60)]
        rows.append((nid, " ".join(words)))
        nid += 1
        return nid - 1, words

    for _ in range(250):
        _long_doc()
    for _ in range(25):
        long_id, words = _long_doc()
        start = rng.randrange(0, len(words) - 12)
        rows.append((nid, " ".join(words[start:start + 12])))
        quote_pairs.append((nid, long_id))
        nid += 1
    for p in range(15):
        long_id, words = _long_doc()
        start = rng.randrange(0, len(words) - 8)
        span = words[start:start + 8]
        pad = [f"pad{p}x{i}" for i in range(8)]
        rows.append((nid, " ".join(span + pad)))
        half_pairs.append((nid, long_id))
        nid += 1
    return rows, quote_pairs, half_pairs


def test_blocked_containment_vs_brute_force(spark):
    rows, quote_pairs, half_pairs = _make_planted(11)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    brute = {
        (r.src, r.dst): round(r.containment, 9)
        for r in ngram_containment_pairs(docs, THRESHOLD).collect()
    }
    blocked = {
        (r.src, r.dst): round(r.containment, 9)
        for r in containment_pairs_blocked(docs, THRESHOLD).collect()
    }

    # precision is exact by construction: every emitted pair is in the
    # brute-force truth WITH the identical ratio (the confirm stage
    # recomputes the true set semantics on candidates)
    for pair, c in blocked.items():
        assert pair in brute and brute[pair] == c, pair

    # planted sanity: brute force sees every quote pair at 1.0 and
    # every half pair above threshold
    for pair in quote_pairs:
        assert brute.get(pair) == 1.0, pair
    for pair in half_pairs:
        assert pair in brute and brute[pair] >= THRESHOLD, pair

    # recall on the planted short-in-long class: both planted span
    # lengths (12 words ~70 chars, 8 words ~45 chars) are far past the
    # w + k - 1 = 17-char winnowing guarantee, so recovery should be
    # near-complete — the floor leaves room only for max_df stop-print
    # collisions in the random background
    q_rec = sum(p in blocked for p in quote_pairs) / len(quote_pairs)
    h_rec = sum(p in blocked for p in half_pairs) / len(half_pairs)
    assert q_rec >= 0.92, (q_rec, [p for p in quote_pairs
                                   if p not in blocked])
    assert h_rec >= 0.85, (h_rec, [p for p in half_pairs
                                   if p not in blocked])


def test_scattered_containment_documented_invisible(spark):
    """The docstring's honesty clause: containment reached through
    SCATTERED shared n-grams (no contiguous span >= w + k - 1 chars)
    is not proposed. Each shared fragment is 3 two-char tokens = 8
    chars — even with the surrounding spaces the longest shared
    character run is 10 chars < k = 12, so ZERO shared k-grams (and
    therefore zero shared fingerprints) exist deterministically —
    brute force finds the pair, the blocked path must not."""
    # long doc: fragments f0..f9 of 3 short words each, separated by
    # connectors unique to the long doc
    frags = [[f"{i}a", f"{i}b", f"{i}c"] for i in range(10)]
    long_words = []
    for i, fr in enumerate(frags):
        long_words += fr + [f"conn{i}"]
    # short doc: the fragments back to back in a DIFFERENT order, so
    # shingles crossing fragment boundaries don't exist in the long
    # doc but all in-fragment shingles do
    short_words = []
    for i in (0, 2, 4, 6, 8, 1, 3, 5, 7, 9):
        short_words += frags[i]
    docs = spark.createDataFrame(
        [(1, " ".join(long_words)), (2, " ".join(short_words))]
        + [(100 + i, " ".join(f"bg{i}w{j}" for j in range(30)))
           for i in range(20)],
        "doc_id long, text string",
    )
    brute = {(r.src, r.dst) for r in
             ngram_containment_pairs(docs, 0.3).collect()}
    assert (2, 1) in brute  # scattered containment is real
    blocked = {(r.src, r.dst) for r in
               containment_pairs_blocked(docs, 0.3).collect()}
    assert (2, 1) not in blocked  # and documented invisible


def test_hot_cap_join_falls_back_without_forced_broadcast(spark):
    """r15 (r14 VERDICT #6, guide §3): the stop-fingerprint cap's anti
    join must NOT force a broadcast — the hot set is occurrences /
    max_df-bounded, which a boilerplate-heavy 100 TB corpus can push
    past the broadcast cap. With the hint gone the strategy is the
    planner's size-based choice: under a disabled broadcast threshold
    the plan must fall back to a non-broadcast anti join (the r14
    shape, F.broadcast(hot), ignored the threshold entirely — that is
    exactly what this pins against)."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        release_caches,
    )
    from web3_flight_rpc_server_spark.operators.winnowing import (
        fingerprint_overlap_pairs,
    )

    rows, _, _ = _make_planted(7)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    conf = spark.conf
    prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                        None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = fingerprint_overlap_pairs(
            docs, min_shared=2, max_df=5
        )._jdf.queryExecution().executedPlan().toString()
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti, plan
        assert not any("Broadcast" in ln for ln in anti), anti
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                     prev_aqe)
        release_caches()


def test_arrow_fp_tier_equals_jvm_expression_tier(spark):
    """r15 (r14 VERDICT #3): the md5-bridge fingerprint pass
    dispatches to the Arrow fold — pin it element-for-element equal
    to the JVM expression tier on a corpus that exercises every
    boundary the fold has: ASCII, CJK multibyte (code-point grams !=
    byte grams), combining marks, supplementary-plane emoji, mixed
    case (the JVM-side lower()), docs shorter than k, shorter than
    k+w-1, nulls, empty strings, and self-repeating text (the
    distinct fold's first-occurrence order)."""
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.functions.hashing import (
        md5_prefix60,
    )
    from web3_flight_rpc_server_spark.operators.winnowing import (
        winnow_fingerprints,
    )

    rows = [
        (0, "The quick brown fox jumps over the lazy dog again and again"),
        (1, "短い中文テキストの繰り返し " * 6),
        (2, "café au lait " * 8),            # combining acute
        (3, "\U0001F600\U0001F601 emoji pad " * 9),  # supplementary plane
        (4, "MiXeD CaSe LATIN with ÜMLAUTS and ß " * 4),
        (5, "short"),                               # < k
        (6, "exactly twelve c"),                    # >= k, < k+w-1
        (7, None),
        (8, ""),
        (9, "x x x x x x x x x x x x x x x x x x x x x x x x"),
        (10, "中" * 40),                            # all-multibyte, repetitive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {r.doc_id: r.fingerprints for r in winnow_fingerprints(
        docs, hash_fn=md5_prefix60).collect()}
    # force the JVM expression tier by passing a value-identical but
    # non-identity hash function (dispatch is by object identity)
    jvm = {r.doc_id: r.fingerprints for r in winnow_fingerprints(
        docs, hash_fn=lambda c: md5_prefix60(c)).collect()}
    assert set(arrow) == set(jvm)
    for i in arrow:
        assert arrow[i] == jvm[i], (i, arrow[i][:5], jvm[i][:5])
    # and the plan really is the Arrow tier
    plan = winnow_fingerprints(
        docs, hash_fn=md5_prefix60
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
