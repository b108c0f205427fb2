"""BPE merge training / encoding (C13, VERDICT r10 next-round #3):
the distributed pair-count + merge loop in operators/vocab.py checked
for EXACT equality against a pure-Python Sennrich-style reference
(the golden-value spirit of the reference repo's ConverterTest,
server/src/test/java/net/broscorp/web3/converter/ConverterTest.java:43-70)
— identical pre-tokenizer, identical deterministic tie-break
(count desc, left asc, right asc), identical left-to-right in-word
merge fold. The DuckDB-oracle disposition is documented on q_bpe_pairs
(queries/text.py): the STATIC first pair-count round is
SQL-expressible and oracle-checked there; the iterative merge ORDER is
a data-dependent argmax fixpoint SQL recursion can't express, so the
loop's correctness gate is this reference equality.
"""

from __future__ import annotations

import re

import pytest

from web3_flight_rpc_server_spark.operators.vocab import (
    BPE_END,
    BPE_WORD_PATTERN,
    bpe_encode,
    bpe_fit,
    bpe_vocab,
    bpe_word_freqs,
)


# --- pure-Python reference (driver-side, dict-based) -----------------

def ref_word_freqs(texts: list[str]) -> dict[str, int]:
    pat = re.compile(BPE_WORD_PATTERN)
    freqs: dict[str, int] = {}
    for t in texts:
        if not t:
            continue
        for w in pat.findall(t.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for cur in syms:
        if out and out[-1] == a and cur == b:
            out[-1] = a + b
        else:
            out.append(cur)
    return out


def ref_learn(freqs: dict[str, int], num_merges: int,
              min_freq: int = 2):
    syms = {w: list(w[:-1]) + [w[-1] + BPE_END] for w in freqs}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = syms[w]
            for pair in zip(s, s[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "n": n}
        )
        syms = {w: _merge_word(s, a, b) for w, s in syms.items()}
    return merges, syms


def ref_encode(text: str, merges: list[dict]) -> list[str]:
    pat = re.compile(BPE_WORD_PATTERN)
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    toks: list[str] = []
    for w in pat.findall(text.lower()) if text else []:
        syms = list(w[:-1]) + [w[-1] + BPE_END]
        while len(syms) > 1:
            best = min(
                (p for p in zip(syms, syms[1:]) if p in ranks),
                key=lambda p: ranks[p],
                default=None,
            )
            if best is None:
                break
            syms = _merge_word(syms, *best)
        toks.extend(syms)
    return toks


CORPUS = [
    "low lower lowest low low newer newer new news",
    "the newer the better, the wider the web",
    "widget widgets wide widely 1024 1024 bytes",
    "Low LOWER ... low!! low?? 42 42 42",
    "",
    None,
    "aaa aaaa aa aaa aaa",  # overlapping-merge stress: (a,a) on runs
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_freqs_match_reference(docs):
    got = {r.word: r.freq for r in bpe_word_freqs(docs).collect()}
    assert got == ref_word_freqs(CORPUS)


def test_fit_matches_reference_exactly_both_strategies(docs):
    ref, _ = ref_learn(ref_word_freqs(CORPUS), 40, min_freq=2)
    dist = bpe_fit(docs, num_merges=40, min_freq=2,
                   strategy="distributed")
    drv = bpe_fit(docs, num_merges=40, min_freq=2, strategy="driver")
    assert dist == ref         # order, pairs, AND counts
    assert drv == ref          # bit-identical across strategies
    assert 1 < len(dist) <= 40  # non-vacuous and early-stopped


def test_min_freq_early_stop(docs):
    # min_freq above every pair count learns nothing
    assert bpe_fit(docs, num_merges=5, min_freq=10 ** 6) == []


def test_encode_matches_reference_and_replays_training(docs):
    merges = bpe_fit(docs, num_merges=30, min_freq=2)
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    _, trained_syms = ref_learn(ref_word_freqs(CORPUS), 30, min_freq=2)
    for i, text in enumerate(CORPUS):
        assert enc[i] == ref_encode(text, merges), f"doc {i}"
        # encode REPLAYS training on training words: each word's
        # encoding equals its post-training symbol state
        if text:
            replay = []
            for w in re.findall(BPE_WORD_PATTERN, text.lower()):
                replay.extend(trained_syms[w])
            assert enc[i] == replay, f"doc {i} replay"
    assert enc[4] == [] and enc[5] == []  # empty + null text


def test_encode_round_trips_pretokenized_text(docs):
    merges = bpe_fit(docs, num_merges=25, min_freq=2)
    for r in bpe_encode(docs, merges).collect():
        words = "".join(r.bpe_tokens).split(BPE_END)[:-1] \
            if r.bpe_tokens else []
        src = re.findall(
            BPE_WORD_PATTERN, (CORPUS[r.doc_id] or "").lower()
        )
        assert words == src


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'ab' pairs tie at count 3 -> ('a','b') must win
    docs = spark.createDataFrame(
        [(0, "ab ab ab ba ba ba")], "doc_id long, text string"
    )
    merges = bpe_fit(docs, num_merges=1, min_freq=2)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "b" + BPE_END)
    ref, _ = ref_learn(ref_word_freqs(["ab ab ab ba ba ba"]), 1)
    assert merges == ref


def test_fit_on_real_documents_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    ref, _ = ref_learn(ref_word_freqs(texts), 60, min_freq=2)
    # the distributed loop on the real corpus; the auto path (driver,
    # at this word count) must agree with it bit-for-bit
    merges = bpe_fit(docs, num_merges=60, min_freq=2,
                     strategy="distributed")
    assert merges == ref
    assert bpe_fit(docs, num_merges=60, min_freq=2) == ref
    assert len(merges) == 60  # real corpus sustains 60 merges


def test_vocab_ids_deterministic_and_complete(docs):
    merges = bpe_fit(docs, num_merges=15, min_freq=2)
    wf = bpe_word_freqs(docs)
    v1 = [(r.token_id, r.token, r.rank)
          for r in bpe_vocab(merges, wf).collect()]
    v2 = [(r.token_id, r.token, r.rank)
          for r in bpe_vocab(merges, wf).collect()]
    assert v1 == v2
    toks = {t for _, t, _ in v1}
    assert {m["merged"] for m in merges} <= toks
    # every encoded token is in the vocabulary (closure property)
    for r in bpe_encode(docs, merges).collect():
        assert set(r.bpe_tokens) <= toks


def test_encode_ids_round_trips_through_vocab(docs):
    from web3_flight_rpc_server_spark.operators.vocab import (
        bpe_encode_ids,
    )

    merges = bpe_fit(docs, num_merges=15, min_freq=2)
    wf = bpe_word_freqs(docs)
    vocab = bpe_vocab(merges, wf)
    id2tok = {r.token_id: r.token for r in vocab.collect()}
    toks = {r.doc_id: list(r.bpe_tokens)
            for r in bpe_encode(docs, merges).collect()}
    for r in bpe_encode_ids(docs, merges, vocab).collect():
        # same-corpus vocab is closed: no OOV ids, and decoding the id
        # sequence reproduces the token sequence exactly
        assert -1 not in r.token_ids
        assert [id2tok[i] for i in r.token_ids] == toks[r.doc_id]


def test_unrolled_sql_oracle_matches_fit_on_adversarial_words(spark):
    """The q_bpe_merges3 oracle's iterated-replace merge application
    must equal the engine's left-to-right fold on the shapes that
    stress it: alternating patterns (a site blocked by separator
    consumption in pass 1 must merge in a later pass, exactly like
    the fold), self-overlapping runs (the fold's no-remerge rule),
    and single-char words (no pairs)."""
    import duckdb

    from web3_flight_rpc_server_spark.queries.text import (
        _bpe_merges3_oracle,
    )

    rows = [
        (1, "abababab abab ab"),
        (2, "aaaaaa aaa a"),
        (3, "xyxyxy xyx yx"),
        (4, "abab aaaa abba baab"),
        (5, "q w e r t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_fit(docs, 3, min_freq=1)
    got = [(m["rank"], m["left"], m["right"], m["n"]) for m in merges]

    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    want = [tuple(r) for r in con.execute(_bpe_merges3_oracle()).fetchall()]
    assert got == want, (got, want)
