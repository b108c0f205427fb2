"""Measure the r11 LM tiers the way tools/funnel_gate_bench.py
measured the semantic gate:

1. Perplexity-gate cost: the curation funnel warm wall with
   cfg.max_perplexity unset vs set (self-fit model), same corpus,
   same session — the "what does the gate cost" number.
2. DSIR selection quality, two targets:
   (a) lang='en' — the label the declared queries use. CAVEAT: the
       synthetic corpus's lang column is NOT recoverable from the
       text (TESTDATA design, same caveat q_text_stats documents),
       so enrichment against it sits at the pool baseline BY CORPUS
       DESIGN; it is reported to show the honest number, not to
       demonstrate movement.
   (b) a TEXT-DERIVED target (docs containing a chosen mid-frequency
       token): the corpus can express this one, so the selected set's
       containing-fraction must exceed the pool's — the actual
       does-DSIR-move-the-distribution check.
3. Classifier separation: AUC of q_quality_score's trained scorer
   against the lang='en' seed label (same caveat: chance-level on
   this corpus; the planted-corpus separation lives in
   tests/test_classifier.py at accuracy 1.0).

Usage:
  python tools/lm_gate_bench.py [sf_dir] [k]

Prints one JSON line; numbers land in BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchdata", "sf1"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.operators.dedup import release_caches
    from web3_flight_rpc_server_spark.pipelines.curation import (
        CurationConfig,
        curation_rejects,
    )
    from web3_flight_rpc_server_spark.session import get_spark
    from web3_flight_rpc_server_spark.sources import tables

    spark = get_spark("lm-gate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = tables.load_table(spark, sf_dir, "documents")

    def funnel_wall(cfg: CurationConfig) -> float:
        best = None
        for _ in range(3):  # warm: best of 3
            t0 = time.perf_counter()
            curation_rejects(docs, cfg).count()
            release_caches()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    ungated = funnel_wall(CurationConfig())
    gated = funnel_wall(CurationConfig(max_perplexity=3000.0))

    # DSIR: does the selected set match the target distribution?
    from web3_flight_rpc_server_spark.operators.lm import (
        dsir_log_weights,
        dsir_resample,
    )

    target = docs.where(F.col("lang") == "en")
    pool_frac = target.count() / docs.count()
    w = dsir_log_weights(docs, target, buckets=512)
    sel = dsir_resample(w, k=k)
    sel_frac = (
        sel.join(docs.select("doc_id", "lang"), "doc_id")
        .where(F.col("lang") == "en")
        .count()
    ) / k
    release_caches()

    # text-derived target: docs containing a mid-frequency token
    from web3_flight_rpc_server_spark.operators.vocab import (
        build_vocabulary,
    )

    vocab = build_vocabulary(docs, max_size=200).collect()
    probe_tok = vocab[len(vocab) // 2].token  # mid-frequency
    has = F.array_contains(F.split(F.lower("text"), " "), probe_tok)
    t2 = docs.where(has)
    pool2 = t2.count() / docs.count()
    w2 = dsir_log_weights(docs, t2, buckets=512)
    sel2 = dsir_resample(w2, k=k)
    sel2_frac = (
        sel2.join(docs.select("doc_id", "text"), "doc_id")
        .where(has).count()
    ) / k
    release_caches()

    # classifier AUC against the seed label (rank-sum / Mann-Whitney)
    from web3_flight_rpc_server_spark.operators.classifier import (
        classifier_score,
        logreg_fit,
    )

    labeled = docs.withColumn("__y", (F.col("lang") == "en").cast("int"))
    model = logreg_fit(labeled, "__y", buckets=512, iters=12, lr=1.0)
    scored = classifier_score(docs, model.as_df(spark)).join(
        labeled.select("doc_id", "__y"), "doc_id"
    )
    # Mann-Whitney with MIDRANKS for ties (round4-tied scores under
    # min-rank bias the AUC downward): fold to one row per distinct
    # score first, so the only global window runs over the tiny
    # distinct-score table, not the corpus — midrank of a tied group
    # is (#scores below) + (group size + 1) / 2.
    from pyspark.sql.window import Window

    g = scored.groupBy("score").agg(
        F.count("*").alias("c"), F.sum("__y").alias("c1")
    )
    below = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rs1 = (
        g.select(
            (
                F.col("c1")
                * (
                    F.coalesce(F.sum("c").over(below), F.lit(0))
                    + (F.col("c") + 1) / 2.0
                )
            ).alias("x")
        )
        .agg(F.sum("x"))
        .collect()[0][0]
    )
    by = {r["__y"]: r["n"] for r in
          scored.groupBy("__y").agg(F.count("*").alias("n")).collect()}
    n1, n0 = by[1], by[0]
    auc = (rs1 - n1 * (n1 + 1) / 2) / (n1 * n0)

    out = {
        "sf_dir": sf_dir,
        "funnel_warm_ungated_s": ungated,
        "funnel_warm_ppl_gated_s": gated,
        "gate_cost_x": round(gated / ungated, 3),
        "dsir_k": k,
        "pool_en_frac": round(pool_frac, 4),
        "dsir_selected_en_frac": round(sel_frac, 4),
        "probe_token": probe_tok,
        "pool_token_frac": round(pool2, 4),
        "dsir_selected_token_frac": round(sel2_frac, 4),
        "clf_auc_vs_seed_label": round(float(auc), 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
