"""End-to-end pretraining dataset assembly: the composition that
turns a raw document table into trainer-ready packed sequences —
curate -> chunk the long tail -> weight sources -> pack -> shard.

Stages (every one an already-verified operator; this module is the
wiring plus the cross-stage invariants):

    1. curate      pipelines/curation.py: gates -> dedup tiers ->
                   decontamination -> blocklist; train split only.
    2. chunk       operators/chunking.py on documents LONGER than
                   ``max_tokens``; short documents pass through whole.
                   Every sample gets a sortable string sample_id
                   ``{doc_id}:{chunk_idx:05d}`` so downstream ordering
                   is deterministic and chunk order follows document
                   order.
    3. mixture     operators/mixture.py (optional): rate-weight named
                   sub-corpora; epoch tags become part of the
                   sample_id so repeated epochs pack as distinct
                   samples.
    4. pack        operators/packing.py: concatenate-and-cut the
                   sample stream at ``budget`` tokens via the
                   two-phase distributed prefix sum.
    5. shard       contiguous bins -> shard files: shard id =
                   start_bin div bins_per_shard, so each shard holds a
                   CONSECUTIVE slice of the packed token stream (what
                   a dataloader wants: sequential reads, no cross-
                   shard sample splits beyond the inherent bin
                   spanning), written partitioned by shard.

Invariants pinned in tests/test_pretraining.py: token conservation
(packed token total == sum of sample tokens), gapless packing across
the chunk/whole mix, deterministic replay (same inputs -> identical
shard assignment), and shard contiguity.

No counterpart in the reference — this is the north-star composition
the individual C11/C13/C19 operators exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..operators.packing import pack_sequences
from ..pipelines.curation import CurationConfig, curate


def samples_from_documents(docs: DataFrame, max_tokens: int = 512,
                           overlap: int = 64,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """(sample_id, text) — long documents chunked into overlapping
    windows, short ones passed through whole. sample_id is
    ``{doc_id}:{chunk_idx:05d}`` (chunk 0 for whole docs), string-
    sortable so sample order == (document order, chunk order)."""
    from ..functions.text import tokens

    n = F.size(tokens(text_col))
    long_docs = docs.where(n > max_tokens)
    short_docs = docs.where(n <= max_tokens)
    chunked = chunk_documents(
        long_docs, max_tokens, overlap, id_col, text_col
    ).select(
        F.col(id_col), F.col("chunk_idx"), F.col("chunk_text").alias("text")
    )
    whole = short_docs.select(
        F.col(id_col), F.lit(0).alias("chunk_idx"), F.col(text_col).alias("text")
    )
    # format_string pads WITHOUT truncating: lpad(x, 5) silently cuts
    # chunk_idx >= 100000 to its first five digits, colliding distinct
    # chunks of very long documents into one sample_id. Past 5 digits
    # the id remains unique but its string sort order diverges from
    # numeric chunk order — callers needing order at that scale should
    # sort on (doc_id, chunk_idx), not the id.
    sid = F.concat_ws(
        ":",
        F.col(id_col).cast("string"),
        F.format_string("%05d", F.col("chunk_idx")),
    )
    return chunked.unionByName(whole).select(sid.alias("sample_id"), "text")


def _remove_dup_spans(train: DataFrame, k: int) -> DataFrame:
    """Optional span-removal stage between curate and chunk: Lee et
    al. 2022 exact substring dedup (operators/substrdedup.py) over the
    train split — the funnel's reject gates drop whole documents;
    this rewrites the SURVIVORS, stripping later occurrences of
    duplicated >=k-token spans before any chunk boundary or token
    budget is computed (dedup-then-chunk, so a removed span never
    wastes budget or splits a window). Documents emptied by removal
    are dropped here (an empty sample has nothing to pack; the loss
    stays visible in the operator's own accounting columns).

    The input is MATERIALIZED once before the operator runs:
    dedup_substrings scans its input ~4 times (occ twice, the token
    rebuild, the id base), and ``train`` arrives as a live plan
    hanging off the whole curation funnel — each scan would re-run
    the funnel's gate joins. Measured at sf10 (r13 assembly bench):
    89.6 s live-plan vs 8.0 s checkpoint + 24.9 s span = 2.7x. At
    deployment scale the equivalent is feeding the funnel's own
    ``out_dir`` parquet instead of the in-session checkpoint."""
    from ..operators.substrdedup import dedup_substrings

    mat = train.select("doc_id", "text").localCheckpoint(eager=True)
    return (
        dedup_substrings(mat, k=k)
        .where(F.col("n_kept") > 0)
        .select("doc_id", "text")
    )


def build_pretraining_dataset(spark: SparkSession, sf_dir: str,
                              out_dir: str | None = None,
                              budget: int = 2048, max_tokens: int = 512,
                              overlap: int = 64,
                              bins_per_shard: int = 16,
                              lang_rates: dict[str, float] | None = None,
                              seed: int = 0,
                              cfg: CurationConfig = CurationConfig(),
                              substring_dedup_k: int | None = None,
                              ) -> tuple[DataFrame, DataFrame]:
    """Returns (packed, stats): ``packed`` is one row per sample —
    (sample_id, n_tokens, start_bin, start_offset, shard) — the exact
    write plan of the packed token stream; ``stats`` is the curation
    funnel ledger. With ``out_dir`` the mapping is written partitioned
    by shard (each shard = a contiguous slice of the stream).

    ``lang_rates`` engages the mixture stage: the train split becomes
    a weighted mixture over its language sub-corpora
    (operators/mixture.py), and the per-source epoch index is folded
    into the document key so repeated epochs pack as distinct
    samples. Languages absent from the dict are dropped — a mixture
    spec is a whitelist, matching trainer config convention."""
    curated, stats = curate(spark, sf_dir, cfg=cfg)
    train = curated.where(F.col("split") == "train")
    if substring_dedup_k is not None:
        # before the mixture stage: epoch repetition is INTENTIONAL
        # duplication — span dedup after it would strip the epochs
        cleaned = _remove_dup_spans(
            train.select("doc_id", "text"), substring_dedup_k
        )
        train = train.drop("text").join(cleaned, "doc_id")
    if lang_rates:
        from ..operators.mixture import mixture_sample

        sources = [
            (lang, train.where(F.col("lang") == lang))
            for lang in sorted(lang_rates)
        ]
        mixed = mixture_sample(sources, lang_rates, seed=seed)
        train = mixed.select(
            F.concat_ws(
                "#", F.col("doc_id").cast("string"),
                F.col("epoch").cast("string"),
            ).alias("doc_id"),
            "text",
        )
    samples = samples_from_documents(
        train, max_tokens, overlap, text_col="text"
    )
    packed = pack_sequences(
        samples, budget, id_col="sample_id", text_col="text"
    )
    sharded = packed.withColumn(
        "shard",
        F.floor(F.col("start_bin") / bins_per_shard).cast("int"),
    )
    if out_dir is not None:
        _write_sharded(sharded, out_dir)
    return sharded, stats


def _write_sharded(sharded: DataFrame, out_dir: str) -> None:
    """Cluster rows by shard BEFORE the dynamic-partition write.
    Without it every write task holds rows of nearly every shard
    (sample_id order is uncorrelated with bin order after the join's
    hash exchange), so the sink opens tasks x shards parquet writers
    — measured at sf10: 98,944 files / 124 s as-is vs 3,096 files /
    6.5 s with the one extra shard-keyed exchange (tools/
    tokenized_assembly_bench.py, BASELINE.md r12). One-ish file per
    shard is also what the dataloader contract wants: a shard is a
    CONTIGUOUS slice of the packed stream, read sequentially."""
    sharded.repartition("shard").write.partitionBy("shard").mode(
        "overwrite"
    ).parquet(out_dir)


def build_tokenized_dataset(spark: SparkSession, sf_dir: str,
                            out_dir: str | None = None,
                            budget: int = 2048, max_tokens: int = 512,
                            overlap: int = 64,
                            bins_per_shard: int = 16,
                            num_merges: int = 200,
                            cfg: CurationConfig = CurationConfig(),
                            substring_dedup_k: int | None = None,
                            ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The tokenizer-aware assembly: curate -> chunk -> TRAIN a BPE
    tokenizer on the curated samples -> encode every sample to token
    ids -> pack by REAL subword counts -> shard. Returns
    (packed, vocab, stats) where ``packed`` carries each sample's
    ``token_ids`` (array<long>) next to its (n_tokens, start_bin,
    start_offset, shard) write plan — a writer emits the physical
    fixed-length sequences from this mapping alone — ``vocab`` is the
    id space (bpe_vocab) an embedding table keys on, and ``stats`` the
    curation ledger.

    This is the composition the r11 pieces exist for: the whitespace
    tier (build_pretraining_dataset) packs by a token-count PROXY;
    trainers consume subword ids, and chunk/sequence budgets in
    subword space differ from whitespace space by the fertility
    factor. Chunking still windows by whitespace tokens (the chunk
    boundary is a pre-tokenization decision — the window must cut at
    word boundaries the encoder respects, and BPE never merges across
    whitespace, so every chunk encodes independently); packing then
    uses the encoded lengths, so token conservation holds in ID space:
    sum(size(token_ids)) == packed stream total (pinned in
    tests/test_pretraining.py).

    Scale shape: one extra corpus pass over build_pretraining_dataset
    (the Arrow-batched encode); bpe_fit's merge loop is bounded by
    DISTINCT words (operators/vocab.py); the vocabulary (chars +
    num_merges rows) rides the encode closure by value. Training on
    the curated TRAIN split only — the tokenizer is part of the model
    artifact and must not see held-out text."""
    from ..operators.vocab import (
        bpe_encode_ids,
        bpe_fit,
        bpe_vocab,
        bpe_word_freqs,
    )

    curated, stats = curate(spark, sf_dir, cfg=cfg)
    train = curated.where(F.col("split") == "train")
    if substring_dedup_k is not None:
        train = _remove_dup_spans(
            train.select("doc_id", "text"), substring_dedup_k
        )
    samples = samples_from_documents(
        train, max_tokens, overlap, text_col="text"
    )
    # the sample table feeds tokenizer training, encoding AND the
    # pack — persist once on the shared ledger (hosts release with
    # release_caches(), the dedup-module contract)
    from ..operators.dedup import _persisted

    samples = _persisted(samples)
    merges = bpe_fit(samples, num_merges, text_col="text", min_freq=2)
    vocab = bpe_vocab(merges, bpe_word_freqs(samples))
    enc = bpe_encode_ids(samples, merges, vocab, text_col="text")
    enc = enc.withColumn("n_bpe", F.size("token_ids"))
    packed = pack_sequences(
        enc, budget, id_col="sample_id", n_tokens_col="n_bpe"
    )
    sharded = (
        packed.join(enc.select("sample_id", "token_ids"), "sample_id")
        .withColumn(
            "shard",
            F.floor(F.col("start_bin") / bins_per_shard).cast("int"),
        )
    )
    if out_dir is not None:
        _write_sharded(sharded, out_dir)
    return sharded, vocab, stats
