"""End-to-end pretraining dataset assembly
(pipelines/pretraining.py): cross-stage invariants over the
curate -> chunk -> mixture -> pack -> shard composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.dedup import release_caches
from web3_flight_rpc_server_spark.pipelines.pretraining import (
    build_pretraining_dataset,
    samples_from_documents,
)

BUDGET, MAX_TOKENS, OVERLAP = 64, 32, 8


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _collect(spark, sf_dir, **kw):
    packed, stats = build_pretraining_dataset(
        spark, sf_dir, budget=BUDGET, max_tokens=MAX_TOKENS,
        overlap=OVERLAP, bins_per_shard=4, **kw
    )
    rows = packed.collect()
    release_caches()
    return rows, stats


def test_tokens_conserved_and_stream_gapless(spark, sf_dir):
    """The packed stream must be exactly the concatenation of the
    samples: positions sorted by sample_id are the prefix sums (no
    gaps, no overlaps) and the token total survives packing."""
    rows, _ = _collect(spark, sf_dir)
    assert rows
    pos = 0
    for r in sorted(rows, key=lambda r: r.sample_id):
        assert r.start_bin * BUDGET + r.start_offset == pos, r
        pos += r.n_tokens
    assert pos == sum(r.n_tokens for r in rows)
    # chunking bounded every sample at the window size
    assert all(r.n_tokens <= MAX_TOKENS for r in rows)


def test_shards_are_contiguous_bin_ranges(spark, sf_dir):
    rows, _ = _collect(spark, sf_dir)
    for r in rows:
        assert r.shard == r.start_bin // 4, r


def test_deterministic_replay(spark, sf_dir):
    a, _ = _collect(spark, sf_dir)
    b, _ = _collect(spark, sf_dir)
    key = lambda rows: {
        (r.sample_id, r.n_tokens, r.start_bin, r.start_offset, r.shard)
        for r in rows
    }
    assert key(a) == key(b)


def test_lang_mixture_repeats_epochs_as_distinct_samples(spark, sf_dir):
    """lang_rates={'en': 2.0} must pack every English train doc's
    samples twice — as distinct #epoch-keyed samples — and drop
    other languages (mixture spec is a whitelist)."""
    base, _ = _collect(spark, sf_dir, lang_rates={"en": 1.0})
    doubled, _ = _collect(spark, sf_dir, lang_rates={"en": 2.0})
    assert len(doubled) == 2 * len(base)

    def doc_of(sid):  # "{doc_id}#{epoch}:{chunk:05d}"
        return sid.split("#")[0], sid.split(":")[0].split("#")[1]

    per_doc: dict[str, set] = {}
    for r in doubled:
        d, e = doc_of(r.sample_id)
        per_doc.setdefault(d, set()).add(e)
    assert per_doc and all(es == {"0", "1"} for es in per_doc.values())


def test_out_dir_partitioned_by_shard(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pretrain")
    packed, _ = build_pretraining_dataset(
        spark, sf_dir, out_dir=out, budget=BUDGET,
        max_tokens=MAX_TOKENS, overlap=OVERLAP, bins_per_shard=4,
    )
    n = packed.count()
    release_caches()
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs
    back = spark.read.parquet(out)
    assert back.count() == n
    assert set(back.columns) >= {
        "sample_id", "n_tokens", "start_bin", "start_offset", "shard"
    }


def test_samples_cover_all_tokens_of_long_docs(spark):
    """A long document's samples must jointly cover its token stream
    (chunk windows tile with overlap; whole docs pass through)."""
    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = samples_from_documents(docs, max_tokens=32, overlap=8).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.sample_id.split(":")[0], []).append(r)
    assert len(by_doc["2"]) == 1 and by_doc["2"][0].text == "tiny doc"
    covered = set()
    for r in by_doc["1"]:
        covered.update(r.text.split())
    assert covered == set(text.split())


# ---------------------------------------------------------------------------
# tokenizer-aware assembly (build_tokenized_dataset)
# ---------------------------------------------------------------------------


def _collect_tokenized(spark, sf_dir, **kw):
    from web3_flight_rpc_server_spark.pipelines.pretraining import (
        build_tokenized_dataset,
    )

    packed, vocab, stats = build_tokenized_dataset(
        spark, sf_dir, budget=BUDGET, max_tokens=MAX_TOKENS,
        overlap=OVERLAP, num_merges=40, **kw,
    )
    rows = packed.collect()
    v = vocab.collect()
    release_caches()
    return rows, v, stats


def test_tokenized_conservation_in_id_space(spark, sf_dir):
    """Packing runs over REAL subword counts: every sample's pack
    length equals size(token_ids), the stream is gapless in id space,
    and no OOV ids appear (the vocab was trained on this corpus)."""
    rows, vocab, _ = _collect_tokenized(spark, sf_dir)
    assert rows
    for r in rows:
        assert r.n_tokens == len(r.token_ids), r.sample_id
        assert all(t >= 0 for t in r.token_ids), r.sample_id
    srt = sorted(rows, key=lambda r: r.sample_id)
    pos = 0
    for r in srt:
        assert r.start_bin * BUDGET + r.start_offset == pos, r.sample_id
        pos += r.n_tokens
    # total == sum of encoded lengths, not the whitespace proxy
    assert pos == sum(len(r.token_ids) for r in rows)
    ids = {t for r in rows for t in r.token_ids}
    assert ids <= {v_.token_id for v_ in vocab}


def test_tokenized_replay_is_deterministic(spark, sf_dir):
    a, _va, _ = _collect_tokenized(spark, sf_dir)
    b, _vb, _ = _collect_tokenized(spark, sf_dir)
    key = lambda rows: sorted(
        (r.sample_id, r.start_bin, r.start_offset, tuple(r.token_ids))
        for r in rows
    )
    assert key(a) == key(b)


def test_pack_by_precomputed_column_matches_default(spark):
    """n_tokens_col with whitespace counts must reproduce the default
    path bit-for-bit — the option changes the SOURCE of lengths, not
    the arithmetic."""
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.functions.text import tokens
    from web3_flight_rpc_server_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, None), (4, "f g h i j")],
        "doc_id long, text string",
    )
    default = pack_sequences(docs, budget=4).collect()
    pre = docs.withColumn(
        "__n",
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(tokens("text"))),
    )
    via_col = pack_sequences(pre, budget=4, n_tokens_col="__n").collect()
    release_caches()
    assert sorted(map(tuple, default)) == sorted(
        (r.doc_id, r.n_tokens, r.start_bin, r.start_offset)
        for r in via_col
    )


# span-removal stage (substring_dedup_k, r12)


def test_span_dedup_stage_strips_cross_doc_spans(spark):
    from web3_flight_rpc_server_spark.pipelines.pretraining import (
        _remove_dup_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e f g h z"),
            (3, "p q r s t u v w"),
            (4, "a b c d e f g h"),  # exact copy -> emptied -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text
           for r in _remove_dup_spans(docs, k=4).collect()}
    assert got == {1: "a b c d e f g h", 2: "x y z",
                   3: "p q r s t u v w"}


def test_assembly_with_span_dedup_packs_fewer_tokens(spark, sf_dir):
    from web3_flight_rpc_server_spark.pipelines.pretraining import (
        build_pretraining_dataset,
    )

    base, _ = build_pretraining_dataset(spark, sf_dir)
    dedup, _ = build_pretraining_dataset(
        spark, sf_dir, substring_dedup_k=20
    )
    t_base = base.agg(F.sum("n_tokens")).collect()[0][0]
    t_dedup = dedup.agg(F.sum("n_tokens")).collect()[0][0]
    # span removal can only shrink the packed stream (the curated
    # split may or may not still carry >=20-token shared spans after
    # the funnel's own dedup gates — reduction is corpus-dependent,
    # never negative), and the mapping must stay gapless over
    # whatever total survives
    assert 0 < t_dedup <= t_base
    last = dedup.orderBy(F.desc("start_bin"),
                         F.desc("start_offset")).first()
    assert last.start_bin * 2048 + last.start_offset + last.n_tokens \
        == t_dedup
