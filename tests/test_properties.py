"""Property-based tests (hypothesis) — the randomized layer the
reference's test suite lacks (SURVEY.md §5: JUnit unit tests only).

Each property batches its examples into ONE Spark job (hypothesis
generates lists), so the suite stays fast.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.functions import ORACLE_ROUND4, round4
from web3_flight_rpc_server_spark.plans import ClientRequest
from web3_flight_rpc_server_spark.plans.requests import logs_row_filter
from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA, hex_to_long

# bounded, finite doubles incl. awkward half-way decimals
_doubles = st.one_of(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.decimals(min_value=-99999, max_value=99999, places=5).map(float),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doubles, min_size=1, max_size=50))
def test_round4_cross_engine_identical(spark, xs):
    """floor(x*1e4+0.5)/1e4 must agree bit-for-bit between Spark and
    DuckDB for arbitrary doubles — the foundation of every float
    oracle in the suite."""
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    got_spark = [r.v for r in sdf.select(round4(F.col("x")).alias("v")).collect()]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {ORACLE_ROUND4.format('?::DOUBLE')}", [x]).fetchone()[0]
        for x in xs
    ]
    assert got_spark == got_duck


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_hex_decode_roundtrip(spark, ns):
    """decode(hex(n)) == n for every representable quantity."""
    sdf = spark.createDataFrame([(n,) for n in ns], "n long")
    hexed = sdf.select(
        "n", F.concat(F.lit("0x"), F.lower(F.hex("n"))).alias("h")
    )
    rows = hexed.select("n", hex_to_long("h").alias("d")).collect()
    assert all(r.n == r.d for r in rows)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="xyz0#", max_size=8)),
        min_size=1, max_size=30,
    )
)
def test_hex_decode_never_throws_on_garbage(spark, ss):
    """ANSI mode must not leak errors out of the decode — malformed
    input becomes null, never an exception (documented deviation from
    the reference's throwing decode)."""
    sdf = spark.createDataFrame([(s,) for s in ss], "h string")
    rows = sdf.select(hex_to_long("h").alias("d")).collect()
    assert len(rows) == len(ss)  # no exception is the assertion


_addr = st.sampled_from(["0xAAA", "0xaaa", "0xBBB", "0xccc", None])
_topic = st.sampled_from(["0xT1", "0xT2", "0xT3"])


def _python_reference_filter(rows, addresses, topics):
    """LogSubscription.filter re-implemented literally
    (LogSubscription.java:36-49) as the property oracle."""
    out = []
    for r in rows:
        if addresses:
            if r[0] is None or r[0].lower() not in {a.lower() for a in addresses}:
                continue
        if topics:
            t = r[2]
            if t is None or len(t) == 0:
                pass  # empty topics passes regardless (the quirk)
            elif t[0] not in topics:
                continue
        out.append(r[3])
    return sorted(out)


FIXTURE = [
    ("0xAAA", "0x", ["0xT1", "0xE1"], 1, "h", 0, "b", 0, False),
    ("0xaaa", "0x", ["0xT2"], 2, "h", 0, "b", 0, False),
    ("0xBBB", "0x", [], 3, "h", 0, "b", 0, False),
    ("0xccc", "0x", None, 4, "h", 0, "b", 0, False),
    (None, "0x", ["0xT1"], 5, "h", 0, "b", 0, False),
]


@pytest.fixture(scope="module")
def logs_fixture(spark):
    return spark.createDataFrame(FIXTURE, LOGS_SCHEMA).cache()


@settings(max_examples=25, deadline=None)
@given(
    addrs=st.one_of(st.none(), st.lists(_addr.filter(lambda a: a), max_size=3)),
    topics=st.one_of(st.none(), st.lists(_topic, max_size=3)),
)
def test_row_filter_matches_java_semantics(spark, logs_fixture, addrs, topics):
    """Fuzz the request filter against a literal Python re-statement
    of the Java predicate — case-insensitivity, topic0-only matching,
    and the empty/null-topics escape hatch all covered."""
    req = ClientRequest("logs", 0, 100,
                        contract_addresses=addrs or None, topics=topics or None)
    got = sorted(
        r.blockNumber
        for r in logs_fixture.where(logs_row_filter(req)).collect()
    )
    expected = _python_reference_filter(FIXTURE, addrs or None, topics or None)
    assert got == expected, f"addrs={addrs} topics={topics}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation equals union-find truth on arbitrary
    graphs (self-loop-free; duplicates and both orientations allowed)."""
    from web3_flight_rpc_server_spark.operators.components import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == truth


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50))
def test_md5_bridge_cross_engine_identical(spark, ss):
    """The 60-bit md5-prefix hash (functions/hashing.py) must agree
    bit-for-bit between Spark and DuckDB for ARBITRARY unicode
    strings — the foundation of the q_simhash / q_winnow_overlap
    oracles, probed beyond the fixture vocabulary."""
    from web3_flight_rpc_server_spark.functions import (
        MD5_PREFIX60_SQL,
        md5_prefix60,
    )

    sdf = spark.createDataFrame([(s,) for s in ss], "s string")
    got_spark = [
        r.h for r in sdf.select(md5_prefix60(F.col("s")).alias("h")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT " + MD5_PREFIX60_SQL.format("?"), [s]
        ).fetchone()[0]
        for s in ss
    ]
    assert got_spark == got_duck
    assert all(0 <= h < 2 ** 60 for h in got_spark)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=50))
def test_punct_count_equals_negated_class_regex(spark, ss):
    """punct_count (the translate-based counter, r14 optimization
    round session 3) must equal regexp_count(s, '[^a-zA-Z0-9 ]') —
    the form the DuckDB oracles keep — for ARBITRARY unicode strings:
    CJK, combining marks, supplementary-plane characters, NBSP,
    control characters. Both count code points (a surrogate pair is
    one character on both paths)."""
    from web3_flight_rpc_server_spark.functions.text import punct_count

    sdf = spark.createDataFrame([(s,) for s in ss], "s string")
    rows = sdf.select(
        punct_count(F.col("s")).alias("got"),
        F.regexp_count(F.col("s"), F.lit("[^a-zA-Z0-9 ]")).alias("want"),
    ).collect()
    assert [r.got for r in rows] == [r.want for r in rows]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**30),
                min_size=1, max_size=30))
def test_redaction_never_touches_bare_numbers(spark, ns):
    """Digit runs that are not phone/card/ssn/ip-shaped — chain values,
    ids of any length — must survive redaction byte-identical, and a
    13+-digit run must never be HALF-eaten (the suffix-match trap):
    either a full standalone match or untouched."""
    from web3_flight_rpc_server_spark.operators.redaction import (
        PII_PATTERNS,
        redact_pii,
    )
    import re

    texts = [f"v {n} end" for n in ns]
    sdf = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r.v for r in sdf.select(redact_pii(F.col("t")).alias("v")).collect()
    ]
    pats = [re.compile(p) for _, p in PII_PATTERNS]
    for t, out, n in zip(texts, got, ns):
        if any(p.search(t) for p in pats):
            # a legitimate full match may redact — but never partially:
            # no digits of the run may survive around a placeholder
            assert "<" not in out or not re.search(r"\d<|>\d", out), (t, out)
        else:
            assert out == t, (t, out)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1,
             max_size=20),
    st.integers(min_value=2, max_value=40),
    st.data(),
)
def test_chunking_tiles_any_document(spark, lengths, max_tokens, data):
    """For arbitrary doc lengths and window/overlap choices: window i
    starts at i*stride, every token is covered, all windows are full
    except possibly the last, and reassembly from stride prefixes
    reproduces the document. (0-length means null text -> no chunks.)"""
    from web3_flight_rpc_server_spark.operators.chunking import (
        chunk_documents,
    )

    overlap = data.draw(st.integers(min_value=0, max_value=max_tokens - 1))
    stride = max_tokens - overlap
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)) if n else None)
        for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, max_tokens, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(lengths):
        if n == 0:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        toks = rows[i][1].split()
        m = -(-max(n - overlap, 1) // stride)  # ceil
        assert [c.chunk_idx for c in chunks] == list(range(m))
        for c in chunks:
            want = toks[c.chunk_idx * stride:c.chunk_idx * stride + max_tokens]
            assert c.chunk_text.split() == want
            assert c.n_tokens == len(want)
        assert all(
            c.n_tokens == max_tokens for c in chunks[:-1]
        ) or n <= max_tokens
        covered = [t for c in chunks for t in c.chunk_text.split()]
        assert set(covered) == set(toks)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1,
             max_size=25),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=6),
)
def test_packing_gapless_for_any_corpus(spark, lengths, budget, parts):
    """pack_sequences invariants for arbitrary corpora, budgets, and
    partition counts: starts are the prefix sums in id order, offsets
    stay inside the budget, totals conserve."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        (i, " ".join(f"w{j}" for j in range(n)) if n else None)
        for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        out = sorted(
            pack_sequences(docs, budget, partitions=parts).collect(),
            key=lambda r: r.doc_id,
        )
    finally:
        release_caches()
    pos = 0
    for r in out:
        assert r.start_bin * budget + r.start_offset == pos, r
        assert 0 <= r.start_offset < budget
        pos += r.n_tokens
    # null text = 0 tokens, non-null n-token text = n (split counts
    # [''] as 1 for the empty string, so lengths>=1 here)
    assert pos == sum(n if n else 0 for n in lengths)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # bucket
            st.floats(min_value=-5, max_value=15,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=9),                # bins
)
def test_histogram_merge_equals_direct_build(spark, rows, bins):
    """For arbitrary values (incl. out-of-range) and bin counts,
    merging per-bucket histograms to the grand total must equal the
    direct bucket-free build exactly — counts, overflow and all."""
    from web3_flight_rpc_server_spark.operators.histograms import (
        COUNTS_COL,
        build_histograms,
        merge_histograms,
    )

    df = spark.createDataFrame(rows, "b int, v double")
    per_bucket = build_histograms(df, ["b"], "v", 0.0, 10.0, bins)
    merged = merge_histograms(per_bucket, []).collect()[0]
    direct = build_histograms(df, [], "v", 0.0, 10.0, bins).collect()[0]
    assert merged[COUNTS_COL] == direct[COUNTS_COL]
    assert (merged.n_below, merged.n_above) == (
        direct.n_below, direct.n_above
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # bucket
            st.integers(min_value=0, max_value=12),       # item id
        ),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=5),                # k
)
def test_heavy_hitter_bounds_always_contain_truth(spark, rows, k):
    """For arbitrary item distributions and any per-bucket K, every
    reported item's [lb, ub] must contain its true count, and every
    item with true count above the merged total error must surface."""
    from collections import Counter

    from web3_flight_rpc_server_spark.operators.heavy_hitters import (
        build_topk_summaries,
        merge_topk,
    )

    df = spark.createDataFrame(
        [(b, f"i{i}") for b, i in rows], "b int, item_id string"
    )
    merged = merge_topk(
        build_topk_summaries(df, ["b"], "item_id", k=k), [], ["b"]
    ).collect()
    exact = Counter(f"i{i}" for _, i in rows)
    reported = {r.item for r in merged}
    for r in merged:
        assert r.lb <= exact[r.item] <= r.ub, (
            f"{r.item}: [{r.lb}, {r.ub}] vs {exact[r.item]}"
        )
    total_err = merged[0].total_err if merged else 0
    for item, n in exact.items():
        if n > total_err:
            assert item in reported, f"{item} (true {n}) missing"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=9.999999,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([0.1, 0.5, 0.9]),
    st.integers(min_value=2, max_value=20),
)
def test_histogram_percentile_error_bounded_by_bin_width(spark, xs, q, bins):
    """For arbitrary in-range data, the quantile read off the
    histogram CDF must land within one bin width of the inverse-CDF
    quantile it targets — the ceil(q*n)-th order statistic, which by
    construction lies inside the bin the estimator selects. (Against
    the INTERPOLATED percentile definition the bound picks up one
    rank of slack, which at toy n can span an arbitrary value gap —
    hypothesis found exactly that: ten 0.0s then [8.0, 9.0] puts
    type-7 p90 at 7.2 while every nearby datum is 8.0; the histogram
    answered 8.5 and was the saner of the two.)"""
    import math

    from web3_flight_rpc_server_spark.operators.histograms import (
        build_histograms,
        percentile_estimate,
    )

    df = spark.createDataFrame([(x,) for x in xs], "v double")
    width = 10.0 / bins
    est = (
        build_histograms(df, [], "v", 0.0, 10.0, bins)
        .select(percentile_estimate(q).alias("e"))
        .collect()[0]
        .e
    )
    k = max(1, math.ceil(q * len(xs)))
    order_stat = sorted(xs)[k - 1]
    assert abs(est - order_stat) <= width + 1e-9, (
        f"q={q} bins={bins}: est {est} vs x_({k}) {order_stat}"
    )


def test_mixture_recipe_arithmetic(spark):
    """Recipe math: shares sum to 1, contributed tokens = rate x
    inventory, and effective epochs = (share x budget) / own tokens —
    the up-weighted small source trains many epochs."""
    from web3_flight_rpc_server_spark.operators.mixture import (
        mixture_recipe,
    )

    small = spark.createDataFrame(
        [(i, "a b c d") for i in range(10)], "doc_id long, text string"
    )  # 40 tokens
    big = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(100)],
        "doc_id long, text string",
    )  # 800 tokens
    rep = {
        r.source: r
        for r in mixture_recipe(
            [("small", small), ("big", big)],
            {"small": 4.0, "big": 1.0},
            token_budget=9600,
        ).collect()
    }
    assert rep["small"].n_tokens == 40 and rep["big"].n_tokens == 800
    assert rep["small"].contributed_tokens == 160
    assert abs(rep["small"].mix_share - 160 / 960) < 1e-9
    assert abs(rep["small"].mix_share + rep["big"].mix_share - 1.0) < 1e-9
    # budget 9600 = 10x the mix: small sees 10 x 4 = 40 epochs
    assert abs(rep["small"].effective_epochs - 40.0) < 1e-9
    assert abs(rep["big"].effective_epochs - 10.0) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=0, max_codepoint=0x2FF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_normalize_is_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary text
    including control bytes and exotic whitespace — a second pass
    through the pipeline must never change already-clean data."""
    from web3_flight_rpc_server_spark.operators.normalize import (
        normalize_text,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = df.select(
        normalize_text("t").alias("once"),
        normalize_text(normalize_text("t")).alias("twice"),
    ).collect()
    for r in rows:
        assert r.once == r.twice


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            min_size=1, max_size=12,
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=9),
)
def test_vocabulary_invariant_under_partitioning(spark, doclists, parts):
    """The vocabulary (ranks, counts, coverage) must be identical no
    matter how the corpus is partitioned — the determinism claim that
    lets replays and different cluster sizes produce the same model."""
    from web3_flight_rpc_server_spark.operators.vocab import (
        build_vocabulary,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doclists)],
        "doc_id long, text string",
    )
    one = [
        (r.rank, r.token, r.n, round(r.coverage, 9))
        for r in build_vocabulary(df.coalesce(1), 4).collect()
    ]
    many = [
        (r.rank, r.token, r.n, round(r.coverage, 9))
        for r in build_vocabulary(df.repartition(parts), 4).collect()
    ]
    assert one == many
