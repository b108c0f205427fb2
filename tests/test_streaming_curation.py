"""Continuous curation (pipelines/streaming_curation.py): stateless
gates on a stream + watermarked fingerprint dedup."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

# long enough to clear the 100-token length-saturation and 0.3+
# diversity terms of the quality score
_GOOD = (
    "the quick brown fox jumps over a lazy dog while many other "
    "animals watch from the forest edge and some birds fly south "
    "for the winter season bringing seeds berries and stories of "
    "mountains rivers valleys deserts plains islands and oceans "
    "that children hear each evening before sleep with wonder "
    "and delight growing in their minds as every tale unfolds "
    "slowly revealing distant lands strange creatures brave "
    "heroes clever tricks lost treasures ancient maps hidden "
    "doors and the quiet courage of small friends standing "
    "together against the storm"
)


def _rows(spark, rows):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (i, text, lang, "test", len(text), base + dt.timedelta(seconds=60 * i))
            for i, (text, lang) in enumerate(rows)
        ],
        DOCS_SCHEMA,
    )


def test_gates_and_fingerprint_dedup_on_stream(spark, tmp_path):
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        curate_stream,
    )

    shuffled = " ".join(reversed(_GOOD.split()))  # same bag of words
    rows = [
        (_GOOD, "en"),                       # 0: survives
        (shuffled, "en"),                    # 1: near-copy -> deduped
        (_GOOD + " seasons slow", "en"),     # 2: blocklist token
        ("der hund und die katze " * 40, "de"),  # 3: lang gate
        ("tiny", "en"),                      # 4: quality gate
    ]
    src = str(tmp_path / "docs")
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        curate_stream(stream, "event_ts", "10 minutes")
        .writeStream.format("memory").queryName("cur_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM cur_stream").collect()
    assert [r.doc_id for r in got] == [0], [r.doc_id for r in got]
    assert got[0].quality >= 0.5 and got[0].fingerprint

    # the same gates run unchanged on a bounded relation
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        gate_stream,
    )

    batch = gate_stream(_rows(spark, rows))
    ids = {r.doc_id for r in batch.collect()}
    assert ids == {0, 1}, ids  # no dedup in gates-only mode


def test_streaming_dedup_keeps_first_within_watermark(spark, tmp_path):
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        curate_stream,
    )

    src = str(tmp_path / "docs2")
    # two micro-batches: original, then a shuffled copy arriving later
    _rows(spark, [(_GOOD, "en")]).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        curate_stream(stream, "event_ts", "30 minutes")
        .writeStream.format("memory").queryName("cur_stream2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        shuffled = " ".join(reversed(_GOOD.split()))
        import datetime as dt

        spark.createDataFrame(
            [(100, shuffled, "en", "test", len(shuffled),
              dt.datetime(2026, 1, 1, 0, 5))],
            DOCS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    ids = [r.doc_id for r in spark.sql("SELECT * FROM cur_stream2").collect()]
    assert ids == [0], f"late near-copy must be suppressed: {ids}"


def test_repetition_gate_rejects_spam(spark, tmp_path):
    """The stateless duplicate-bigram ceiling (Gopher repetition rule,
    in-row tier) drops degenerate repeated-phrase docs on the stream
    while passing diverse text, with every other gate held permissive."""
    from web3_flight_rpc_server_spark.pipelines.curation import CurationConfig
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        curate_stream, dup_bigram_frac, gate_stream,
    )

    cfg = CurationConfig(
        allowed_langs=("unknown",), min_quality=0.0,
        max_dup_bigram_frac=0.5,
    )
    rows = [
        ("spam " * 40 + "spam", "en"),          # 0: dup frac ~1 -> reject
        ("alpha beta gamma delta epsilon", "en"),  # 1: dup frac 0 -> keep
    ]
    src = str(tmp_path / "docs3")
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        curate_stream(stream, "event_ts", "10 minutes", cfg)
        .writeStream.format("memory").queryName("cur_rep")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = [r.doc_id for r in spark.sql("SELECT * FROM cur_rep").collect()]
    assert ids == [1], ids

    # the scalar itself, hand-checked on a bounded relation:
    # "a b a b a" -> 4 bigrams, 2 distinct -> 0.5
    from web3_flight_rpc_server_spark.functions.text import tokens

    val = (
        _rows(spark, [("a b a b a", "en")])
        .select(dup_bigram_frac(tokens("text")).alias("f"))
        .collect()[0].f
    )
    assert abs(val - 0.5) < 1e-9

    # default config (ceiling 1.0) admits even fully repetitive docs
    ids = {r.doc_id for r in gate_stream(
        _rows(spark, rows),
        CurationConfig(allowed_langs=("unknown",), min_quality=0.0),
    ).collect()}
    assert ids == {0, 1}, ids


def test_classifier_gate_expr_equals_batch_scorer(spark):
    """The in-row score expression must equal the batch scorer on a
    damping='none' model (same features, same weights, different
    summation shape) — the exactness contract that lets one trained
    model gate both the pool and the stream."""
    import pytest as _pytest

    from web3_flight_rpc_server_spark.operators.classifier import (
        classifier_score,
        classifier_score_expr,
        logreg_fit,
    )

    rows = [
        (i, ("alpha beta gamma " if i % 2 == 0 else "junk noise bad ") * 8,
         1 if i % 2 == 0 else 0)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = logreg_fit(docs, "label", buckets=128, iters=8, lr=1.0,
                       damping="none")
    batch = {r.doc_id: r.score
             for r in classifier_score(
                 docs, model.as_df(spark), damping="none").collect()}
    inrow = {r.doc_id: r.s
             for r in docs.select(
                 "doc_id",
                 classifier_score_expr(model, "text").alias("s"),
             ).collect()}
    assert set(batch) == set(inrow)
    for i in batch:
        assert inrow[i] == _pytest.approx(batch[i], rel=1e-12), i


def test_classifier_gate_on_stream(spark, tmp_path):
    """A trained damping='none' model gates the ingest stream: good
    docs pass, spammy docs are rejected by score, and the predicate is
    stateless (plain memory-sink append query, no watermark needed)."""
    from web3_flight_rpc_server_spark.operators.classifier import logreg_fit
    from web3_flight_rpc_server_spark.pipelines.curation import CurationConfig
    from web3_flight_rpc_server_spark.pipelines.streaming_curation import (
        gate_stream,
    )

    spam = ("buy cheap pills now click here win money fast " * 30).strip()
    # train on labeled seed rows shaped like the stream's two classes
    seed = spark.createDataFrame(
        [(i, _GOOD + f" extra{i}", 1) for i in range(10)]
        + [(100 + i, spam + f" extra{i}", 0) for i in range(10)],
        "doc_id long, text string, label int",
    )
    model = logreg_fit(seed, "label", buckets=256, iters=10, lr=1.0,
                       damping="none")

    rows = [(_GOOD, "en"), (spam, "en")]
    src = str(tmp_path / "docs_clf")
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cfg = CurationConfig(min_clf_score=0.5)
    q = (
        gate_stream(stream, cfg, clf_model=model)
        .writeStream.format("memory").queryName("cur_clf")
        .option("checkpointLocation", str(tmp_path / "ckpt_clf"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.sql("SELECT * FROM cur_clf").collect()}
    assert got == {0}, got

    # without the model the predicate is inert: min_clf_score set but
    # no clf_model passed == the plain default gates (the spam row is
    # independently rejected by the lang gate — its vocabulary has no
    # stopwords — which is fine: the assertion is inertness, not
    # admission)
    no_model = {r.doc_id
                for r in gate_stream(_rows(spark, rows), cfg).collect()}
    plain = {r.doc_id
             for r in gate_stream(_rows(spark, rows)).collect()}
    assert no_model == plain
