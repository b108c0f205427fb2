"""Distributed vocabulary building (C13 adjunct): the token-frequency
table every tokenizer training / frequency-filter step starts from.

One explode + one hash count over the corpus, then a deterministic
top-``max_size`` truncation (count desc, token asc — replays and
engine versions produce the identical vocabulary) annotated with the
running COVERAGE fraction: vocab[i].coverage = fraction of all token
occurrences covered by ranks 1..i. Coverage is what practitioners
actually size vocabularies by ("smallest V covering 99.5%"), and
computing it inside the same plan costs one extra window over the
already-tiny truncated table.

Scale shape: the explode produces corpus-token rows but aggregates
map-side into per-partition (token, count) partials before the single
shuffle; the top-K is TakeOrdered (per-partition heaps, driver merge
of K), never a global sort of the frequency table. For corpora whose
TAIL must also be bounded (the frequency table itself too large to
sort), cap it first with operators/heavy_hitters.py summaries — same
counts, explicit error bounds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..functions.spread import spread
from ..functions.text import tokens


def build_vocabulary(docs: DataFrame, max_size: int,
                     text_col: str = "text") -> DataFrame:
    """(rank, token, n, coverage) — the ``max_size`` most frequent
    tokens with cumulative occurrence coverage in [0, 1]."""
    if max_size < 1:
        raise ValueError(f"max_size must be >= 1, got {max_size}")
    # scale-adaptive repartition before the token explode: a compact
    # parquet corpus arrives as 1-2 scan partitions and would run the
    # corpus-sized explode on 1-2 cores (functions/spread.py; r14
    # optimization round)
    counts = (
        spread(docs.select(text_col))
        .select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_size)
    total = counts.agg(F.sum("n").alias("__t"))
    w = (
        Window.orderBy(F.desc("n"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the window runs over <= max_size rows (post-truncation), so the
    # single-partition sort it implies is bounded by design
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("token")))
            .alias("rank"),
            "token",
            "n",
            (F.sum("n").over(w) / F.col("__t")).alias("coverage"),
        )
    )


def oov_rate(docs: DataFrame, vocab: DataFrame,
             text_col: str = "text") -> DataFrame:
    """Per-document out-of-vocabulary token fraction — the acceptance
    check for a candidate vocabulary against a held-out corpus. One
    explode + one broadcast semi-probe (the vocab is small by
    construction); null/empty documents report 0 tokens, OOV 0.0."""
    toks = spread(docs.select("doc_id", text_col)).select(
        "doc_id", F.explode_outer(tokens(text_col)).alias("token")
    )
    hit = toks.join(
        F.broadcast(vocab.select("token").withColumn("__in", F.lit(1))),
        "token",
        "left",
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.when(F.col("token").isNotNull()
                       & (F.col("token") != ""), 1)).alias("n_tokens"),
        F.coalesce(
            F.count(
                F.when(
                    F.col("token").isNotNull()
                    & (F.col("token") != "")
                    & F.col("__in").isNull(),
                    1,
                )
            ).cast("double")
            / F.nullif(
                F.count(
                    F.when(
                        F.col("token").isNotNull() & (F.col("token") != ""),
                        1,
                    )
                ).cast("double"),
                F.lit(0.0),
            ),
            F.lit(0.0),
        ).alias("oov_frac"),
    )


def unigram_logprob_score(docs: DataFrame, vocab: DataFrame,
                          text_col: str = "text",
                          oov_logprob: float = -20.0) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap tier of
    the LM-perplexity quality filter (CCNet-style pipelines bucket
    documents by LM score; a unigram model needs only the vocabulary
    table, no trained model). Gibberish, boilerplate-free noise and
    wrong-language text all score low because their tokens are rare or
    absent in the corpus-wide vocabulary.

    p(token) = n / total over the FULL vocabulary table (pass an
    untruncated build_vocabulary output; a truncated one makes the
    tail OOV, which the score then punishes at ``oov_logprob`` — the
    standard floor for unseen tokens). One explode_outer + one
    broadcast model join + one doc_id aggregation — token-free
    (null/empty) documents ride the same pass via their null token row
    and surface with a NULL score and 0 tokens, with no completion
    join back to the doc list (an earlier draft joined scores back to
    docs on doc_id: both sides are O(docs), so that join shuffles
    twice and cannot broadcast — the conditional aggregate gets the
    same semantics for one shuffle)."""
    total = vocab.agg(F.sum("n").alias("__t"))
    model = F.broadcast(
        vocab.crossJoin(F.broadcast(total)).select(
            "token",
            F.log(F.col("n").cast("double") / F.col("__t")).alias("__lp"),
        )
    )
    toks = spread(docs.select("doc_id", text_col)).select(
        "doc_id", F.explode_outer(tokens(text_col)).alias("token")
    )
    scored = toks.join(model, "token", "left")
    real = F.col("token").isNotNull() & (F.col("token") != "")
    return scored.groupBy("doc_id").agg(
        F.avg(
            F.when(real, F.coalesce(F.col("__lp"), F.lit(oov_logprob)))
        ).alias("mean_logprob"),
        F.count(F.when(real, 1)).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# BPE subword tokenizer training (C13): the step after the frequency
# table — a real pretraining pipeline trains a subword tokenizer, not
# just a word vocabulary. Classic byte-pair-encoding merge learning
# (Sennrich et al. 2016, arXiv:1508.07909) re-expressed Spark-first:
# the corpus collapses to a DISTINCT-WORD frequency table once (one
# explode + one hash agg over the raw corpus — at 100 TB this is the
# only pass that touches every byte), then every merge round is one
# linear pair-count hash-agg over that bounded table plus a 1-row
# argmax collect. num_merges bounds the rounds; ties break
# deterministically (count desc, left asc, right asc) so replays and
# engines agree.

# word pre-tokenization: letter runs, digit runs, non-space symbol
# runs — deterministic, lowercased, identical between the Spark
# regexp_extract_all pass, the Python encoder and any SQL oracle
BPE_WORD_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
BPE_END = "</w>"  # end-of-word marker: merges never cross words, and
                  # a token sequence reconstructs its word boundaries


def bpe_word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) distinct-word frequency table — the corpus-sized
    pass of BPE training. Everything after it is bounded by the number
    of DISTINCT words, not corpus bytes."""
    # scale-adaptive repartition — the 1-2-scan-partition explode
    # trap (functions/spread.py; r14 optimization round)
    return (
        spread(docs.select(text_col))
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_WORD_PATTERN), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> "F.Column":
    """word -> its character array with BPE_END glued to the last
    char: ['l','o','w</w>'] for 'low'. The empty-string filter guards
    the regex-split edge elements (Java split("") emits a trailing ""
    under limit -1) so the symbol array is exactly the characters."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(BPE_END))),
    )


def _adjacent_pair_counts(wf: DataFrame) -> DataFrame:
    """(left, right, n): corpus-weighted adjacent-symbol pair counts —
    the per-round hash agg. Map-side combine happens in the partial
    aggregation; the shuffle carries only distinct pairs."""
    s = F.col("syms")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("left"),
        F.slice(s, 2, F.size(s) - 1).alias("right"),
    )
    return (
        wf.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"),
                 F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(syms: "F.Column", left: str, right: str) -> "F.Column":
    """Fold the symbol array left-to-right, replacing each adjacent
    (left, right) occurrence with left+right — the exact Sennrich
    in-word merge semantics (after ('a','a') merges, 'aaa' becomes
    ['aa','a</w>'], never ['a','aa</w>']). Pure JVM-side aggregate:
    F.get (not element_at) reads the accumulator tail so the empty
    accumulator yields NULL instead of an ANSI out-of-bounds error."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (cur == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def bpe_fit(docs: DataFrame, num_merges: int, text_col: str = "text",
            min_freq: int = 2, strategy: str = "auto",
            driver_word_limit: int = 2_000_000) -> list[dict]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns
    the ordered merge table as driver-side rows
    ``{rank, left, right, merged, n}`` (rank is 1-based priority;
    n is the corpus-weighted pair count at learn time) — bounded by
    num_merges, so driver-side by design, like the K centroids of
    operators/kmeans.py.

    Scale shape: ONE corpus-sized explode+agg builds the distinct-word
    frequency table — at 100 TB this is the only pass that touches
    every byte, and everything after is bounded by DISTINCT words
    (Zipf: ~10^7-10^8 for a web corpus, ~100x smaller than the
    corpus). Then one of two loop strategies, bit-identical by
    construction (same counts, same tie-break, same fold — pinned
    against each other in tests/test_bpe.py):

    - ``"driver"``: collect the (word, freq) table once and run the
      merge loop in plain Python on the driver — the shape production
      tokenizer trainers use (HuggingFace/SentencePiece train from
      word counts, not raw corpora), because a 32k-merge loop as
      Spark jobs pays 32k job launches + 32k linear scans for
      argmaxes over a table that fits in driver memory.
    - ``"distributed"``: each merge round is (a) one linear pair-count
      hash agg over the word table (map-side combine, distinct-pair
      shuffle), (b) a 1-row TakeOrdered argmax with the deterministic
      tie-break, (c) a JVM-side fold rewriting the symbol arrays,
      with a per-round localCheckpoint keeping the plan O(1) per
      round instead of nesting num_merges fold expressions (quadratic
      codegen). The fallback for frequency tables past driver memory.

    ``"auto"`` (default) counts distinct words and picks driver below
    ``driver_word_limit`` (2M words x ~50 B ≈ 100 MB — comfortably
    inside the 8 GB driver), distributed above. Both stop early when
    the best pair's count drops below ``min_freq`` (learning
    noise-floor pairs would overfit singleton typos).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if strategy not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    wf_raw = bpe_word_freqs(docs, text_col)
    if strategy == "auto":
        strategy = (
            "driver"
            if wf_raw.limit(driver_word_limit + 1).count()
            <= driver_word_limit
            else "distributed"
        )
    if strategy == "driver":
        freqs = {r.word: r.freq for r in wf_raw.collect()}
        syms = {w: list(w[:-1]) + [w[-1] + BPE_END] for w in freqs}
        merges: list[dict] = []
        for rank in range(1, num_merges + 1):
            counts: dict[tuple, int] = {}
            for w, f in freqs.items():
                s = syms[w]
                for pair in zip(s, s[1:]):
                    counts[pair] = counts.get(pair, 0) + f
            if not counts:
                break
            (a, b), n = min(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )
            if n < min_freq:
                break
            merges.append({"rank": rank, "left": a, "right": b,
                           "merged": a + b, "n": n})
            for w, s in syms.items():
                out: list[str] = []
                for cur in s:
                    if out and out[-1] == a and cur == b:
                        out[-1] = a + b
                    else:
                        out.append(cur)
                syms[w] = out
        return merges
    wf = (
        wf_raw.select("freq", _initial_symbols().alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(1, num_merges + 1):
        best = (
            _adjacent_pair_counts(wf)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0].n < min_freq:
            break
        b = best[0]
        merges.append({"rank": rank, "left": b.left, "right": b.right,
                       "merged": b.left + b.right, "n": b.n})
        prev = wf
        wf = wf.select(
            "freq", _apply_merge(F.col("syms"), b.left, b.right)
            .alias("syms")
        ).localCheckpoint(eager=True)
        prev.unpersist()
    wf.unpersist()
    return merges


def bpe_encode(docs: DataFrame, merges: list[dict],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: adds
    ``out_col`` (array<string>) of subword tokens, BPE_END marking
    word finals. Null/empty text encodes to an empty array.

    Encoding applies, per word, the lowest-rank applicable merge until
    none applies — provably identical to replaying the merges in rank
    order, and O(word_len * applicable_merges) instead of O(V). The
    merge table rides the closure as a plain dict (by value — workers
    never import this package), the kernel is an Arrow-batched pandas
    UDF with a per-batch word cache (Zipf makes the cache hit rate the
    dominant term), and the pass is embarrassingly parallel — no
    shuffle at any corpus size."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    pattern = BPE_WORD_PATTERN
    end = BPE_END

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        import re

        pat = re.compile(pattern)
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w[:-1]) + [w[-1] + end]
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best_rank is None
                                          or r < best_rank):
                        best_rank, best_pair = r, (a, b)
                if best_pair is None:
                    break
                a, b = best_pair
                out: list[str] = []
                for cur in syms:  # same left-to-right fold as training
                    if out and out[-1] == a and cur == b:
                        out[-1] = a + b
                    else:
                        out.append(cur)
                syms = out
            cache[w] = syms
            return syms

        res = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in pat.findall(t.lower()):
                    toks.extend(encode_word(w))
            res.append(toks)
        return pd.Series(res)

    return docs.withColumn(out_col, _enc(F.col(text_col)))


def bpe_vocab(merges: list[dict], word_freqs: DataFrame) -> DataFrame:
    """The token vocabulary a merge table induces over a corpus:
    base symbols (single chars + char</w> actually present in the
    word table) plus one token per merge, each with its priority rank
    (base symbols rank 0). The id space downstream embedding tables
    key on."""
    spark = word_freqs.sparkSession
    base = (
        word_freqs.select(
            F.explode(_initial_symbols()).alias("token")
        )
        .distinct()
        .withColumn("rank", F.lit(0))
    )
    merged = local_df(
        spark, [(m["merged"], m["rank"]) for m in merges],
        "token string, rank int"
    ) if merges else spark.createDataFrame([], "token string, rank int")
    return (
        base.unionByName(merged)
        .groupBy("token")
        .agg(F.min("rank").alias("rank"))
        .select(
            F.row_number().over(
                Window.orderBy(F.asc("rank"), F.asc("token"))
            ).alias("token_id"),
            "token", "rank",
        )
    )


def bpe_encode_ids(docs: DataFrame, merges: list[dict],
                   vocab: DataFrame, text_col: str = "text",
                   out_col: str = "token_ids",
                   oov_id: int = -1) -> DataFrame:
    """Tokenize straight to the id space ``vocab`` (a
    :func:`bpe_vocab` output) defines: adds ``out_col``
    (array<long>) — what operators/chunking.py + packing.py consume.
    Tokens outside the vocabulary map to ``oov_id`` (possible only
    when encoding with a vocab built over a DIFFERENT corpus; a vocab
    from the same corpus is closed over every encodable token).

    The vocabulary is bounded (chars + num_merges) so it rides the
    closure by value like the merge table — one collect at plan build,
    no join, no shuffle; the encode stays a single Arrow-batched
    map pass."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    ids = {r["token"]: r["token_id"]
           for r in vocab.select("token", "token_id").collect()}
    pattern = BPE_WORD_PATTERN
    end = BPE_END
    oov = oov_id

    @pandas_udf("array<long>")
    def _enc_ids(texts: pd.Series) -> pd.Series:
        import re

        pat = re.compile(pattern)
        cache: dict[str, list[int]] = {}

        def encode_word(w: str) -> list[int]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w[:-1]) + [w[-1] + end]
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best_rank is None
                                          or r < best_rank):
                        best_rank, best_pair = r, (a, b)
                if best_pair is None:
                    break
                a, b = best_pair
                out: list[str] = []
                for cur in syms:
                    if out and out[-1] == a and cur == b:
                        out[-1] = a + b
                    else:
                        out.append(cur)
                syms = out
            enc = [ids.get(s, oov) for s in syms]
            cache[w] = enc
            return enc

        res = []
        for t in texts:
            toks: list[int] = []
            if t:
                for w in pat.findall(t.lower()):
                    toks.extend(encode_word(w))
            res.append(toks)
        return pd.Series(res)

    return docs.withColumn(out_col, _enc_ids(F.col(text_col)))
