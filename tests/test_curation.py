"""End-to-end curation pipeline (pipelines/curation.py): funnel
accounting must partition the corpus, survivors must pass every gate,
and the written layout must shard by split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.pipelines.curation import (
    REJECT_ORDER,
    CurationConfig,
    curate,
)
from web3_flight_rpc_server_spark.sources import tables


def test_curation_funnel_partitions_corpus(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    cfg = CurationConfig(n_splits=4)  # wide val bucket: sf0.001 keeps few docs
    curated, stats = curate(spark, sf_dir, out_dir=out, cfg=cfg)
    total = tables.load_table(spark, sf_dir, "documents").count()
    ledger = {r.stage: r.n_docs for r in stats.collect()}

    # every doc lands in exactly one funnel stage
    assert sum(ledger.values()) == total
    assert set(ledger) <= {"kept"} | set(REJECT_ORDER)
    assert ledger.get("kept", 0) > 0
    # the synthetic corpus exercises every gate that has matter at
    # this sf: non-en docs exist, dups are injected, blocklist words
    # appear
    assert ledger.get("lang", 0) > 0
    assert ledger.get("exact_dup", 0) + ledger.get("near_dup", 0) > 0

    rows = curated.collect()
    assert len(rows) == ledger["kept"]
    # survivors pass the expression gates...
    assert all(r.quality >= cfg.min_quality for r in rows)
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts)), "exact dups must not survive"
    blocked = {w for r in rows for w in r.text.lower().split() if w in cfg.blocklist}
    assert not blocked, f"blocklist tokens survived: {blocked}"
    # ...and both split values exist with the md5-deterministic shape
    splits = {r.split for r in rows}
    assert splits == {"train", "val"}

    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val"}
    back = spark.read.parquet(out)
    assert back.count() == ledger["kept"]


def test_curation_rejects_are_first_failing_gate(spark, sf_dir):
    """A doc failing an early gate must not be charged to a later one:
    reject doc_ids are unique across stages."""
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    rejects = curation_rejects(docs).collect()
    ids = [r.doc_id for r in rejects]
    assert len(ids) == len(set(ids)), "doc charged to multiple stages"
    assert {r.reject_reason for r in rejects} <= set(REJECT_ORDER)


def test_lsh_and_exact_funnels_agree_on_kept_set(spark, sf_dir):
    """The production near-dup tier (MinHash-LSH, pairs_fn=None) and
    the oracle-friendly exact-Jaccard tier (what q_curation_funnel
    declares) must route every document identically at fixture scale:
    LSH candidates are exact-verified before rejecting, so any
    divergence means the banding missed a true >=threshold pair. This
    pins the driver-attested artifact to the 100 TB code path."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_caches,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    try:
        exact = {
            (r.doc_id, r.reject_reason)
            for r in curation_rejects(
                docs, pairs_fn=lambda d: ngram_jaccard_pairs(d, threshold=0.3)
            ).collect()
        }
        lsh = {
            (r.doc_id, r.reject_reason)
            for r in curation_rejects(docs, pairs_fn=None).collect()
        }
    finally:
        release_caches()
    assert lsh == exact
    assert any(reason == "near_dup" for _, reason in exact), (
        "parity is vacuous unless the near-dup gate fires at this sf"
    )


def test_mixture_sample_epochs_and_determinism(spark):
    """Weighted mixture invariants: every row of a rate-2.5 source
    appears in exactly 2 or 3 epochs (never 0-or-5-by-chance), the
    partial-epoch keep set is identical across partitionings/seeds
    reruns, and rates are validated."""
    import pytest

    from web3_flight_rpc_server_spark.operators.mixture import (
        mixture_sample,
    )

    a = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    b = spark.createDataFrame([(i + 1000,) for i in range(200)], "doc_id long")

    out = mixture_sample(
        [("a", a), ("b", b)], {"a": 2.5, "b": 0.3}, seed=3
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault((r.source, r.doc_id), []).append(r.epoch)
    for (src, _id), epochs in by_id.items():
        if src == "a":
            assert sorted(epochs) in ([0, 1], [0, 1, 2])
        else:
            assert epochs == [0]
    n_a3 = sum(1 for k, v in by_id.items() if k[0] == "a" and len(v) == 3)
    n_b = sum(1 for k in by_id if k[0] == "b")
    # deterministic hash sampling lands near the rate on 200 rows
    assert 60 <= n_a3 <= 140          # ~0.5 * 200
    assert 30 <= n_b <= 90            # ~0.3 * 200

    again = mixture_sample(
        [("a", a.repartition(7)), ("b", b.repartition(3))],
        {"a": 2.5, "b": 0.3}, seed=3,
    ).collect()
    assert {(r.source, r.doc_id, r.epoch) for r in again} == {
        (r.source, r.doc_id, r.epoch) for r in out
    }

    with pytest.raises(ValueError, match=">= 0"):
        mixture_sample([("a", a)], {"a": -1.0})
    with pytest.raises(ValueError, match="at least one source"):
        mixture_sample([("a", a)], {"a": 0.0})


def test_funnel_quarantine_ledger(spark):
    """A template-heavy corpus (near-identical but not exact-equal
    docs, so the exact gate can't collapse them) must surface in the
    funnel's quarantine ledger when the cap bites — and the
    quarantined docs are ADMITTED, the documented recall trade the
    ledger exists to report."""
    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
        curation_rejects,
    )

    template = (
        "the service terms boilerplate page with all rights reserved "
        "and a cookie notice plus privacy policy text for everyone "
        "visiting this very standard website footer region today"
    )
    rows = [(i, f"{template} serial {i}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap above population: normal dedup, empty ledger
    loose = CurationConfig(min_quality=0.0, lsh_max_bucket=1000)
    rejects, quarantine = curation_rejects(
        docs, loose, with_quarantine=True
    )
    near = {r.doc_id for r in rejects.collect()
            if r.reject_reason == "near_dup"}
    assert len(near) == 59  # one canonical survives
    assert quarantine.count() == 0

    # cap below population: buckets quarantined, docs admitted
    tight = CurationConfig(min_quality=0.0, lsh_max_bucket=20)
    rejects, quarantine = curation_rejects(
        docs, tight, with_quarantine=True
    )
    ledger = quarantine.collect()
    assert ledger and all(r.n_docs > 20 for r in ledger)
    near = {r.doc_id for r in rejects.collect()
            if r.reject_reason == "near_dup"}
    assert len(near) < 59  # the quarantined buckets' dups went unseen

    # exact tier: no ledger by construction
    from web3_flight_rpc_server_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    _, q2 = curation_rejects(
        docs, loose, with_quarantine=True,
        pairs_fn=lambda d: ngram_jaccard_pairs(d, threshold=0.3),
    )
    assert q2 is None


def _sem_docs_and_embeddings(spark):
    """A corpus that exercises the semantic gate's routing AND its
    stage scoping. 64-dim embeddings (the _semantic_keep_oracle CTE is
    dim-64); values round-tripped through float32 so Spark's stored
    floats equal the DuckDB view's doubles bit for bit."""
    import numpy as np

    # lexically DISTINCT sentences (so the near_dup 3-gram gate stays
    # quiet and routing is decided by the gates under test), each with
    # english stopwords for the lang gate and ~11 unique tokens for
    # the quality gate
    texts = {
        0: "the silver owl waits and watches over quiet northern woods",
        1: "the silver owl waits and watches over quiet northern woods",
        # ^ exact dup of 0 -> exact_dup
        2: "a slow train is rolling through wide open valleys tonight",
        # ^ blocklist word, semantic canonical of cluster {2, 6}
        3: "many bright students read the old books in city libraries",
        4: "fresh bread and warm soup arrive at the corner cafe",
        # ^ semantic twin of 3 -> semantic_dup
        5: "the river boats carry heavy cargo to distant ports yearly",
        6: "winter storms often close the high mountain passes for days",
        # ^ semantic twin of 2 -> semantic_dup
        7: "loud music echoed across the hall after every show ended",
        # ^ NO embedding row -> passes the semantic gate
        8: "le la les et je il ne pas un une du des au ce",  # lang
        9: "the gardeners plant new roses along stone paths in spring",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rng = np.random.default_rng(61)
    vecs = {}
    for i in (0, 2, 3, 5, 9):
        vecs[i] = rng.normal(size=64)
    vecs[1] = vecs[5] + 0.01 * rng.normal(size=64)  # twin of KEPT doc 5,
    # but doc 1 is rejected exact_dup -> scoping must protect doc 5
    vecs[4] = vecs[3] + 0.01 * rng.normal(size=64)
    vecs[6] = vecs[2] + 0.01 * rng.normal(size=64)
    vecs[8] = vecs[9] + 0.01 * rng.normal(size=64)  # twin of doc 9, but 8
    # is rejected at lang -> scoping must protect doc 9
    f32 = {
        i: [float(np.float32(x)) for x in v] for i, v in vecs.items()
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in sorted(f32.items())],
        "doc_id long, embedding array<float>",
    )
    return docs, emb, f32


def test_semantic_gate_routing_matches_duckdb_twin(spark):
    """The optional semantic_dup gate, per-doc routing parity against
    a DuckDB twin that REUSES _semantic_keep_oracle's CTE over the
    survivor-scoped embeddings (VERDICT r8 next-round #5): the keep
    verdict the funnel acts on equals DuckDB's independent
    blocking+verify+transitive-closure recomputation, first-failing-
    gate order holds (a semantic canonical falls through to
    blocklist), and docs rejected by EARLIER gates cannot drag their
    semantic twins down."""
    import duckdb
    import pandas as pd

    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.pipelines.curation import (
        curation_rejects,
    )
    from web3_flight_rpc_server_spark.queries.vectors import (
        _semantic_keep_oracle,
    )

    docs, emb, f32 = _sem_docs_and_embeddings(spark)
    cfg = CurationConfig(contamination_frac=1.01)  # contam gate off:
    # c/n can never reach 1.01, so routing is decided by the gates
    # under test regardless of which md5 bucket each doc_id hashes to
    try:
        rejects = {
            r.doc_id: r.reject_reason
            for r in curation_rejects(docs, cfg, embeddings=emb).collect()
        }
    finally:
        release_caches()
    routing = {
        i: rejects.get(i, "kept") for i in range(10)
    }

    # earlier gates by construction
    assert routing[1] == "exact_dup"
    assert routing[8] == "lang"

    # DuckDB twin: _semantic_keep_oracle's CTE over the embeddings of
    # the docs that actually REACHED the semantic gate
    survivors = [i for i in sorted(f32) if routing[i] not in ("exact_dup", "lang")]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": survivors, "embedding": [f32[i] for i in survivors]}
        ),
    )
    verdict = {
        int(r[0]): int(r[1])
        for r in con.execute(
            _semantic_keep_oracle(threshold=cfg.semantic_threshold,
                                  n_cells=cfg.semantic_n_cells,
                                  top_m=cfg.semantic_top_m)
        ).fetchall()
    }
    # the twin must actually find the planted clusters
    assert verdict == {0: 1, 2: 1, 3: 1, 4: 0, 5: 1, 6: 0, 9: 1}

    for i in survivors:
        if verdict[i] == 0:
            assert routing[i] == "semantic_dup", (i, routing[i])
    # first-failing-gate order: the semantic canonical (kept by the
    # gate) still falls to the LATER blocklist gate
    assert routing[2] == "blocklist"
    # scoping: twins of earlier-rejected docs survive
    assert routing[5] == "kept" and routing[9] == "kept"
    # no-embedding doc passes the gate
    assert routing[7] == "kept"
    assert routing[0] == "kept" and routing[3] == "kept"


def test_semantic_gate_keeps_single_persisted_scan_plan(spark):
    """The funnel's plan properties hold with the semantic gate on:
    stage branches still read the persisted gate projection, no
    cartesian product appears (the semantic tier is the per-cell
    cogroup, never a cross join), and the reject map unions cleanly."""
    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.pipelines.curation import (
        curation_rejects,
    )

    docs, emb, _ = _sem_docs_and_embeddings(spark)
    cfg = CurationConfig(contamination_frac=1.01)
    try:
        rejects = curation_rejects(docs, cfg, embeddings=emb)
        plan = rejects._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, (
            "stage branches must read the persisted gate projection"
        )
        assert "collect_list" not in plan
    finally:
        release_caches()


def test_perplexity_gate_default_off_changes_nothing(spark, sf_dir):
    """max_perplexity=None (the default every declared query runs
    under) must leave the reject ledger bit-identical to a config
    that never heard of the gate."""
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    base = sorted((r.doc_id, r.reject_reason)
                  for r in curation_rejects(docs).collect())
    off = sorted((r.doc_id, r.reject_reason)
                 for r in curation_rejects(
                     docs, CurationConfig(max_perplexity=None)).collect())
    assert base == off
    assert "perplexity" not in {reason for _i, reason in base}


def test_perplexity_gate_routes_by_standalone_score(spark, sf_dir):
    """Gated run: the perplexity rejects are EXACTLY the quality-gate
    survivors whose standalone round4 perplexity (model fit on those
    same survivors — the stage-scoping contract) exceeds the ceiling;
    first-failing-gate semantics hold; short docs pass."""
    from web3_flight_rpc_server_spark.functions.rounding import round4
    from web3_flight_rpc_server_spark.operators.lm import (
        bigram_lm_fit,
        perplexity_score,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    base = curation_rejects(docs)  # ungated: defines the early gates
    early = {
        r.doc_id for r in base.collect()
        if r.reject_reason in ("lang", "quality")
    }
    survivors = docs.join(
        spark.createDataFrame([(i,) for i in early] or [(-1,)],
                              "doc_id long"),
        "doc_id", "left_anti",
    ).select("doc_id", "text")
    lm = bigram_lm_fit(survivors)
    scored = perplexity_score(survivors, lm).select(
        "doc_id", round4(F.col("ppl")).alias("p4")
    ).collect()
    ppls = sorted(r.p4 for r in scored if r.p4 is not None)
    assert ppls, "fixture corpus must have scoreable docs"
    ceiling = ppls[int(len(ppls) * 0.8)]  # reject the worst ~20%
    want = {r.doc_id for r in scored
            if r.p4 is not None and r.p4 > ceiling}

    got = curation_rejects(
        docs, CurationConfig(max_perplexity=float(ceiling))
    ).collect()
    got_ppl = {r.doc_id for r in got if r.reject_reason == "perplexity"}
    assert got_ppl == want
    # first-failing-gate: no lang/quality reject is charged to it
    assert not (got_ppl & early)
    # ledger still partitions: no doc charged twice
    ids = [r.doc_id for r in got]
    assert len(ids) == len(set(ids))


def test_perplexity_gate_accepts_external_model(spark, sf_dir):
    """The CCNet deployment shape: a model trained on a REFERENCE
    corpus scores the pool. A reference of clean English makes
    the fixture's en docs cheap and everything the reference never
    saw expensive — the gate must follow the external model's
    verdicts, not the pool's self-fit."""
    from web3_flight_rpc_server_spark.functions.rounding import round4
    from web3_flight_rpc_server_spark.operators.lm import (
        bigram_lm_fit,
        perplexity_score,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import curation_rejects

    docs = tables.load_table(spark, sf_dir, "documents")
    ref = docs.where(F.col("lang") == "en").select("doc_id", "text")
    lm = bigram_lm_fit(ref)

    base = curation_rejects(docs)
    early = {
        r.doc_id for r in base.collect()
        if r.reject_reason in ("lang", "quality")
    }
    survivors = docs.join(
        spark.createDataFrame([(i,) for i in early] or [(-1,)],
                              "doc_id long"),
        "doc_id", "left_anti",
    ).select("doc_id", "text")
    scored = perplexity_score(survivors, lm).select(
        "doc_id", round4(F.col("ppl")).alias("p4")
    ).collect()
    ppls = sorted(r.p4 for r in scored if r.p4 is not None)
    ceiling = ppls[len(ppls) // 2]
    want = {r.doc_id for r in scored
            if r.p4 is not None and r.p4 > ceiling}

    got = curation_rejects(
        docs, CurationConfig(max_perplexity=float(ceiling)), ppl_model=lm
    ).collect()
    assert {r.doc_id for r in got
            if r.reject_reason == "perplexity"} == want


def test_trained_langid_gate_replaces_heuristic(spark):
    """langid_model_df opts the lang gate into the trained multiclass
    classifier (operators/classifier.py:softmax_fit) — the CCNet
    deployment shape. On vocab the stopword heuristic cannot place
    (no stopwords -> 'unknown', so the heuristic path rejects
    EVERYTHING under allowed_langs=('aa',)), the trained gate admits
    exactly the modeled language; first-failing-gate ledger semantics
    are unchanged (a blocklisted 'aa' doc still rejects as blocklist,
    not lang)."""
    import random

    from web3_flight_rpc_server_spark.operators.classifier import (
        softmax_fit,
    )
    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
        curation_rejects,
    )

    rng = random.Random(7)
    vocab = {
        "aa": ["korv", "plim", "zast", "welk", "dorn"],
        "bb": ["miro", "tesk", "fulb", "grop", "yeln"],
    }

    def _doc(i, lang, extra=""):
        body = " ".join(rng.choice(vocab[lang]) for _ in range(12))
        return (i, (body + extra), lang)

    seed = spark.createDataFrame(
        [_doc(i, "aa") for i in range(20)]
        + [_doc(100 + i, "bb") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    model = softmax_fit(seed, "lang", buckets=64, iters=8, lr=1.0)
    pool = spark.createDataFrame(
        [_doc(1000 + i, "aa") for i in range(10)]
        + [_doc(2000 + i, "bb") for i in range(10)]
        + [_doc(3000, "aa", " slow")],  # blocklisted survivor-class doc
        "doc_id long, text string, lang string",
    ).drop("lang")  # the gate must not see the fixture label
    cfg = CurationConfig(allowed_langs=("aa",), min_quality=0.0,
                         neardup_threshold=1.01,
                         contamination_frac=1.01)
    rej = {r.doc_id: r.reject_reason
           for r in curation_rejects(
               pool, cfg, langid_model_df=model.as_df(spark)
           ).collect()}
    assert all(rej.get(1000 + i) is None for i in range(10))
    assert all(rej.get(2000 + i) == "lang" for i in range(10))
    assert rej.get(3000) == "blocklist"  # lang passed, next gate fired
    # the heuristic path on the same pool: every doc is 'unknown'
    rej_h = {r.doc_id: r.reject_reason
             for r in curation_rejects(pool, cfg).collect()}
    assert all(v == "lang" for v in rej_h.values())
    assert len(rej_h) == 21
