"""End-to-end scale bench for the tokenizer-aware pretraining
assembly (pipelines/pretraining.py:build_tokenized_dataset): curate ->
chunk -> BPE-train on the curated train split -> encode to ids ->
pack by real subword counts -> shard. The r11 flagship composition
had conservation tests only; this measures it (r11 VERDICT #2).

Two measurements per run:

1. ``end_to_end_s`` — one cold call of build_tokenized_dataset with a
   real partitioned parquet write, timed as a unit (the number a
   pipeline owner plans around).
2. A staged re-composition (fresh cache state) that forces each stage
   boundary so the wall splits attribute honestly: curate+chunk
   materialization, bpe_fit, the Arrow encode pass, pack+shard+write.
   The staged pass runs under a PERMISSIVE config (every gate open):
   the default funnel is production-correct but collapses the
   replicated bench corpus back to its sf0.1 survivor set (the
   per-replica suffix token leaves cross-replica Jaccard >= 0.3, so
   near-dup canonicalization eats the replicas — exactly what it
   should do to near-identical web pages), which would leave the
   BPE/encode/pack stages measuring a constant 132 docs at every SF.
   Scale economics need the corpus to REACH those stages.

Plus the encode-economics numbers the r11 review asked to verify:
- ``encode_words_per_s`` — whitespace-word throughput of the encode
  stage (the claimed dominant term rides the per-batch word cache);
- ``distinct_word_ratio`` — corpus distinct/total words. The encode
  cache is per Arrow batch, so its MISS rate is lower-bounded by this
  global ratio (every first-in-batch occurrence misses at least
  once); a ratio << 1 is what makes the cache the dominant win.
- ``fertility`` — subword tokens per whitespace word (the factor that
  separates ID-space budgets from whitespace budgets).

Usage: python tools/tokenized_assembly_bench.py [sf_dir] [num_merges]
Prints one JSON line; append the result to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchdata", "sf1"
    )
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.operators.dedup import (
        _persisted,
        release_caches,
    )
    from web3_flight_rpc_server_spark.pipelines.pretraining import (
        build_tokenized_dataset,
        samples_from_documents,
    )
    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("tokenized-assembly-bench")
    out: dict = {"sf_dir": sf_dir, "num_merges": num_merges}

    # ---- 1. one-shot end-to-end, real write --------------------------
    tmp = tempfile.mkdtemp(prefix="tokassembly_")
    try:
        t0 = time.monotonic()
        packed, vocab, stats = build_tokenized_dataset(
            spark, sf_dir, out_dir=os.path.join(tmp, "shards"),
            num_merges=num_merges,
        )
        out["end_to_end_s"] = round(time.monotonic() - t0, 2)
        out["n_packed_samples"] = spark.read.parquet(
            os.path.join(tmp, "shards")
        ).count()
        out["vocab_size"] = vocab.count()
    finally:
        release_caches()
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- 2. staged re-composition (fresh caches) ---------------------
    from web3_flight_rpc_server_spark.operators.vocab import (
        bpe_encode_ids,
        bpe_fit,
        bpe_vocab,
        bpe_word_freqs,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import curate
    from web3_flight_rpc_server_spark.operators.packing import (
        pack_sequences,
    )

    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
    )

    permissive = CurationConfig(
        allowed_langs=("en", "de", "fr", "es", "unknown"),
        min_quality=0.0,
        neardup_threshold=1.01,     # > 1.0: no near-dup pair passes
        contamination_frac=1.01,    # > 1.0: decontamination off
        blocklist=("\x00",),        # never matches
    )
    t0 = time.monotonic()
    curated, _stats = curate(spark, sf_dir, cfg=permissive)
    train = curated.where(F.col("split") == "train")
    samples = _persisted(samples_from_documents(train, 512, 64,
                                                text_col="text"))
    n_samples = samples.count()
    t_curate = time.monotonic() - t0

    # ---- span-removal stage, measured in isolation (r12 VERDICT #3):
    # the r12 substring_dedup_k stage sits in the flagship assembly
    # with conservation tests only; this times it on the same
    # permissive corpus the other stages see (the 10-replica bench
    # structure gives it real duplicated volume to strip). Measured
    # SEPARATELY so the curate/fit/encode/pack stage walls stay
    # comparable with the r12 BASELINE rows; the removed-token
    # fraction is the downstream token-budget effect at the
    # whitespace tier, and x fertility estimates the subword tokens
    # the budget would save.
    from web3_flight_rpc_server_spark.operators.substrdedup import (
        dedup_substrings,
    )

    span_k = 20  # the q_substring_dedup fixture convention
    t0 = time.monotonic()
    # materialize the train slice first — the _remove_dup_spans
    # composition shape: the operator scans its input ~4x and a
    # live funnel plan re-runs the gate joins per scan (measured at
    # sf10: 89.6 s live vs 8.0 + 24.9 s checkpointed = 2.7x; the
    # checkpoint wall is charged to this stage)
    train_mat = train.select("doc_id", "text").localCheckpoint(
        eager=True
    )
    span = _persisted(dedup_substrings(train_mat, k=span_k))
    kept_t, dropped_t, emptied = span.agg(
        F.sum("n_kept"), F.sum("n_dropped"),
        F.sum(F.when((F.col("n_kept") == 0) & (F.col("n_dropped") > 0),
                     1).otherwise(0)),
    ).collect()[0]
    t_span = time.monotonic() - t0
    span_removed_frac = float(dropped_t) / float(kept_t + dropped_t)
    # drop the stage's cache NOW: the rebuilt-text cache pinned through
    # the fit/encode/pack stages starves their execution memory
    # (measured: sf10 encode 8 s -> 29 s with the cache resident) and
    # would break stage comparability with the r12 rows
    span.unpersist()

    # corpus word economics (one extra pass, not counted in any stage)
    words = samples.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("w")
    )
    n_words, n_distinct = words.agg(
        F.count("*"), F.countDistinct("w")
    ).collect()[0]

    t0 = time.monotonic()
    merges = bpe_fit(samples, num_merges, text_col="text", min_freq=2)
    t_fit = time.monotonic() - t0

    t0 = time.monotonic()
    vocab = bpe_vocab(merges, bpe_word_freqs(samples))
    enc = _persisted(
        bpe_encode_ids(samples, merges, vocab, text_col="text")
        .withColumn("n_bpe", F.size("token_ids"))
    )
    n_bpe = enc.agg(F.sum("n_bpe")).collect()[0][0]
    t_encode = time.monotonic() - t0

    tmp2 = tempfile.mkdtemp(prefix="tokassembly2_")
    try:
        t0 = time.monotonic()
        packed = pack_sequences(enc, 2048, id_col="sample_id",
                                n_tokens_col="n_bpe")
        from web3_flight_rpc_server_spark.pipelines.pretraining import (
            _write_sharded,
        )

        _write_sharded(
            packed.join(enc.select("sample_id", "token_ids"), "sample_id")
            .withColumn("shard",
                        F.floor(F.col("start_bin") / 16).cast("int")),
            os.path.join(tmp2, "shards"),
        )
        t_pack = time.monotonic() - t0
    finally:
        release_caches()
        shutil.rmtree(tmp2, ignore_errors=True)

    out.update({
        "stage_curate_chunk_s": round(t_curate, 2),
        "stage_span_dedup_s": round(t_span, 2),
        "span_k": span_k,
        "span_removed_token_frac": round(span_removed_frac, 4),
        "span_emptied_docs": int(emptied),
        "span_bpe_tokens_saved_est": int(span_removed_frac * n_bpe),
        "stage_bpe_fit_s": round(t_fit, 2),
        "stage_encode_s": round(t_encode, 2),
        "stage_pack_write_s": round(t_pack, 2),
        "n_samples": n_samples,
        "ws_words": int(n_words),
        "distinct_words": int(n_distinct),
        "distinct_word_ratio": round(n_distinct / n_words, 4),
        "bpe_tokens": int(n_bpe),
        "fertility": round(n_bpe / n_words, 4),
        "encode_words_per_s": int(n_words / t_encode),
    })
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
