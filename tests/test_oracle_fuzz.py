"""Cross-engine parity on GENERATED corpora: the driver pins each
oracle on one fixture dataset; these tests re-run the fingerprint and
ranking oracles on randomized corpora (fixed seeds, injected near-dup
structure) so parity holds for the OPERATOR, not one dataset.

Plain seeded random rather than hypothesis: each example costs two
engine runs, so three structured corpora beat hundreds of tiny ones.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from web3_flight_rpc_server_spark.registry import all_queries

from .oracle_harness import compare

QUERIES = all_queries()
# The deterministic oracles: blocked generation is pigeonhole/df-cap
# EXACT, so Spark == oracle on any corpus. q_minhash_lsh is fuzzed
# separately below: LSH banding recall is probabilistic near the
# threshold (the fixture's near-dups sit high enough for full recall;
# a random corpus's J≈0.3 pairs collide in a band with p≈0.06), so
# its fuzz contract is precision==1 + certain recall of exact copies,
# not set equality.
# q_substring_dedup: removal semantics are deterministic set
# algebra on ANY corpus (keep-first + coverage, no probabilistic
# tier), so full set equality is the right fuzz contract; the
# generator's mutated copies leave >=20-token shared runs that
# exercise real span removal (r12).
# q_containment_blocked (r13): the COMPOSED winnow-propose +
# exact-confirm path is deterministic given the md5 tier (rolling
# minima, df cap, shared floor, set ratios — no probabilistic
# stage), so set equality holds on any corpus; the generator's
# mutated copies and shared passages give the propose stage real
# candidates.
FUZZED = ["q_simhash", "q_winnow_overlap", "q_bm25",
          "q_substring_dedup", "q_containment_blocked"]

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu spark vector stream"
).split()


def _corpus(seed: int, n_docs: int = 120):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        toks = rng.choices(_VOCAB, k=rng.randint(5, 60))
        docs.append((i, " ".join(toks)))
    # inject near-dup structure: mutated copies and shared passages
    for j in range(15):
        src_id, src_text = docs[rng.randrange(n_docs)]
        toks = src_text.split()
        for _ in range(rng.randint(0, 2)):
            toks[rng.randrange(len(toks))] = rng.choice(_VOCAB)
        docs.append((n_docs + j, " ".join(toks)))
    passage = " ".join(rng.choices(_VOCAB, k=12))
    for j in range(5):
        _, tail = docs[rng.randrange(n_docs)]
        docs.append((n_docs + 100 + j, passage + " " + tail))
    return docs


@pytest.mark.parametrize("seed", [7, 23, 1009])
@pytest.mark.parametrize("name", FUZZED)
def test_oracle_parity_on_generated_corpus(spark, tmp_path, seed, name):
    rows = _corpus(seed)
    sf_dir = str(tmp_path / f"corpus{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES[name]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"{name} seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [7, 23])
def test_minhash_lsh_contract_on_generated_corpus(spark, tmp_path, seed):
    """On arbitrary corpora the LSH tier's contract is: every emitted
    pair is a true J >= threshold pair with the exact Jaccard value
    (precision 1 — candidates are exact-verified), and identical-text
    pairs are ALWAYS found (equal signatures collide in every band)."""
    rng = random.Random(seed * 31)
    rows = _corpus(seed)
    copies = [
        (9000 + i, rows[rng.randrange(len(rows))][1]) for i in range(8)
    ]
    rows = rows + copies
    sf_dir = str(tmp_path / f"lsh{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_minhash_lsh"]
    got = {
        (r.d1, r.d2): r.jaccard for r in q.fn(spark, sf_dir).collect()
    }
    truth = {
        (d1, d2): j for d1, d2, j in con.execute(q.oracle).fetchall()
    }
    assert got, "no pairs found at all"
    for pair, j in got.items():
        assert pair in truth and truth[pair] == pytest.approx(j), pair
    by_text: dict[str, int] = {}
    for did, text in rows:
        if text in by_text:
            first = by_text[text]
            pair = (min(first, did), max(first, did))
            assert got.get(pair) == 1.0, f"exact copy missed: {pair}"
        else:
            by_text[text] = did


@pytest.mark.parametrize("seed", [7, 1009])
def test_pack_oracle_parity_on_generated_corpus(spark, tmp_path, seed):
    """Sequence packing parity on randomized corpora including the
    edge shapes the fixture lacks: null text (packs as 0 tokens on
    both engines), empty-ish one-token docs, and budget-straddling
    long docs. Ids stay unique — with tied order keys both engines'
    ROWS-frame tie order is arbitrary, so cross-engine parity is only
    defined for unique keys (tie invariants are pinned separately in
    tests/test_packing.py)."""
    rng = random.Random(seed * 17)
    rows = []
    for i in range(150):
        kind = rng.random()
        if kind < 0.1:
            text = None
        elif kind < 0.2:
            text = rng.choice(_VOCAB)
        elif kind < 0.3:
            text = " ".join(rng.choices(_VOCAB, k=rng.randint(500, 700)))
        else:
            text = " ".join(rng.choices(_VOCAB, k=rng.randint(1, 80)))
        rows.append((i * 3 + seed % 3, text))
    sf_dir = str(tmp_path / f"pack{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(3)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_pack"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_pack seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [11, 503])
def test_chunk_oracle_parity_on_generated_corpus(spark, tmp_path, seed):
    """Chunking parity on randomized corpora: null text (no chunks),
    single-token docs (one short chunk), exact-boundary lengths, and
    long docs spanning many overlapping windows."""
    rng = random.Random(seed * 13)
    rows = []
    for i in range(120):
        kind = rng.random()
        if kind < 0.1:
            text = None
        elif kind < 0.2:
            text = rng.choice(_VOCAB)
        elif kind < 0.3:
            # exact window/stride boundary lengths
            text = " ".join(rng.choices(_VOCAB, k=rng.choice([16, 112, 128, 129, 240])))
        else:
            text = " ".join(rng.choices(_VOCAB, k=rng.randint(2, 400)))
        rows.append((i, text))
    sf_dir = str(tmp_path / f"chunk{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(3)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_chunk"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_chunk seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [5, 97])
def test_normalize_oracle_parity_on_dirty_corpus(spark, tmp_path, seed):
    """Normalization parity on corpora salted with the noise classes
    the clean fixture lacks: control bytes, tab/newline runs, leading
    and trailing space, C1 range characters, and null text."""
    rng = random.Random(seed * 7)
    noise = ["\t", "\n", "\r\n", "\x00", "\x07", "\x0b", "\x7f",
             "\x85", "\x9f", "  ", "   "]
    rows = []
    for i in range(100):
        if rng.random() < 0.08:
            rows.append((i, None))
            continue
        toks = rng.choices(_VOCAB, k=rng.randint(1, 25))
        parts = []
        for t in toks:
            parts.append(t)
            parts.append(rng.choice(noise) if rng.random() < 0.5 else " ")
        text = "".join(parts)
        if rng.random() < 0.3:
            text = rng.choice(noise) + text
        rows.append((i, text))
    sf_dir = str(tmp_path / f"norm{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_normalize"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_normalize seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [11, 211])
def test_asof_oracle_parity_on_generated_events(spark, tmp_path, seed):
    """As-of parity against DuckDB's native ASOF JOIN on generated
    event streams with the classic edge shapes: exact ts ties between
    purchase and click (>= includes equality), users with clicks only
    or purchases only (left join NULLs), and interleaved histories.
    Click (user, ts) pairs are kept unique — with duplicate right-side
    keys at the winning timestamp BOTH engines tie-break arbitrarily
    and parity would be testing luck, not semantics."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for user in range(1, 21):
        kinds = rng.choice([("click", "purchase"), ("click",), ("purchase",)])
        click_ts = sorted(
            rng.sample(range(0, 50_000), rng.randint(1, 30))
        ) if "click" in kinds else []
        for t in click_ts:
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user, "click",
                 round(rng.uniform(0, 100), 3), "{}")
            )
            eid += 1
        if "purchase" in kinds:
            for _ in range(rng.randint(1, 15)):
                if click_ts and rng.random() < 0.3:
                    t = rng.choice(click_ts)  # exact tie with a click
                else:
                    t = rng.randrange(0, 55_000)
                rows.append(
                    (eid, base + dt.timedelta(seconds=t), user, "purchase",
                     round(rng.uniform(0, 100), 3), "{}")
                )
                eid += 1
    sf_dir = str(tmp_path / f"asof{seed}")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    q = QUERIES["q_join_asof"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_join_asof seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [13, 307])
def test_sessionize_oracle_parity_on_generated_events(spark, tmp_path, seed):
    """Sessionization parity on generated event histories engineered
    around the gap boundary: inter-event gaps drawn NEAR 30 minutes
    (just under, exactly equal — a gap of exactly 30:00 does NOT
    split, only strictly-greater does — and just over), plus same-ts
    event bursts ordered by the event_id tie-break."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    gaps = [1799, 1800, 1801, 5, 60, 7200]  # seconds; 1800 = the edge
    rows, eid = [], 0
    for user in range(1, 16):
        t = rng.randrange(0, 3600)
        for _ in range(rng.randint(1, 40)):
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user, "click",
                 round(rng.uniform(0, 10), 3), "{}")
            )
            eid += 1
            if rng.random() < 0.15:  # same-ts burst: tie-break path
                rows.append(
                    (eid, base + dt.timedelta(seconds=t), user, "click",
                     round(rng.uniform(0, 10), 3), "{}")
                )
                eid += 1
            t += rng.choice(gaps)
    sf_dir = str(tmp_path / f"sess{seed}")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    q = QUERIES["q_sessionize"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_sessionize seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [17, 401])
def test_time_rollup_oracle_parity_across_calendar_boundaries(
    spark, tmp_path, seed
):
    """Multi-granularity rollup parity on events engineered around the
    calendar edges date_trunc must agree on cross-engine: year and
    month boundaries, exact midnight/top-of-hour instants, and
    sub-second (microsecond) timestamps."""
    import datetime as dt

    rng = random.Random(seed)
    anchors = [
        dt.datetime(2023, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 2, 29, 12, 30),       # leap day
        dt.datetime(2024, 3, 31, 23, 0),
        dt.datetime(2024, 4, 1, 0, 0, 0, 1),
    ]
    rows = []
    for eid in range(300):
        ts = rng.choice(anchors) + dt.timedelta(
            seconds=rng.randint(-3600, 3600),
            microseconds=rng.randint(0, 999999),
        )
        rows.append(
            (eid, ts, rng.randrange(1, 20), "click",
             round(rng.uniform(0, 50), 3), "{}")
        )
    sf_dir = str(tmp_path / f"cal{seed}")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/events.parquet")
    )
    # q_time_rollup registers ALL fixture views; satisfy the other
    # tables with symlinks to the real fixture dir
    import os

    from .conftest import SF_DIR

    for name in os.listdir(SF_DIR):
        dst = os.path.join(sf_dir, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, name), dst)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    q = QUERIES["q_time_rollup"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_time_rollup seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [19, 503])
def test_user_funnel_oracle_parity_on_generated_sequences(
    spark, tmp_path, seed
):
    """Funnel parity on generated per-user event orderings engineered
    around the sequence rules: precursors BEFORE stage entry (must not
    count), same-instant follow-ups (must count), stage re-entries,
    and users stopping at every depth."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 6, 1)
    types = ["view", "click", "purchase", "error", "signup"]
    rows, eid = [], 0
    for user in range(1, 40):
        t = rng.randrange(0, 500)
        for _ in range(rng.randint(1, 20)):
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user,
                 rng.choice(types), round(rng.uniform(0, 5), 3), "{}")
            )
            eid += 1
            # 20%: same-instant next event (boundary), else advance
            if rng.random() >= 0.2:
                t += rng.randrange(1, 400)
    sf_dir = str(tmp_path / f"funnel{seed}")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    q = QUERIES["q_user_funnel"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_user_funnel seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("seed", [37, 709])
def test_vocab_oracle_parity_on_generated_corpus(spark, tmp_path, seed):
    """Vocabulary parity on random corpora with engineered count ties
    (token-ascending tie-break is the determinism claim) and null/empty
    documents."""
    rng = random.Random(seed * 11)
    rows = []
    for i in range(100):
        kind = rng.random()
        if kind < 0.08:
            rows.append((i, None))
        elif kind < 0.16:
            rows.append((i, ""))
        else:
            rows.append(
                (i, " ".join(rng.choices(_VOCAB[:12], k=rng.randint(1, 30))))
            )
    sf_dir = str(tmp_path / f"vocab{seed}")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    q = QUERIES["q_vocab"]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"q_vocab seed={seed}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ["q_retention", "q_transitions"])
@pytest.mark.parametrize("seed", [43, 811])
def test_behavior_analytics_parity_on_generated_events(
    spark, tmp_path, seed, name
):
    """Retention and transition parity on generated activity streams:
    users spanning week boundaries, single-event users, same-timestamp
    bursts (event_id tie-break), and multi-week dormancy gaps."""
    import datetime as dt

    rng = random.Random(seed * 7 + hash(name) % 97)
    base = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "error", "signup"]
    rows, eid = [], 0
    for user in range(1, 30):
        t = rng.randrange(0, 14 * 86400)
        for _ in range(rng.randint(1, 15)):
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user,
                 rng.choice(types), 1.0, "{}")
            )
            eid += 1
            if rng.random() < 0.2:  # same-instant burst
                rows.append(
                    (eid, base + dt.timedelta(seconds=t), user,
                     rng.choice(types), 1.0, "{}")
                )
                eid += 1
            t += rng.choice([60, 3600, 86400, 7 * 86400, 20 * 86400])
    sf_dir = str(tmp_path / f"beh{seed}{name}")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(sf_dir + "/events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    q = QUERIES[name]
    problems = compare(q.fn(spark, sf_dir), con, q.oracle)
    assert not problems, f"{name} seed={seed}: " + "; ".join(problems)
