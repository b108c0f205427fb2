"""Row-scale datapoint for the media fingerprint tiers (VERDICT r9
next-round #6): the image near-dup tier and the incremental media
ingest loop are brute-force-verified on kilobyte fixture corpora; this
harness measures them on a SYNTHETIC 1e5-image PNG corpus generated
with the repo's own writer (multimodal/media.py:_png_encode — no
external libs), so the decode stage, the capped fingerprint blocking,
and the per-modality persistent-index loop all run at real row counts.

    python tools/media_scale_bench.py [n_images] [out_dir]

Corpus design (deterministic, seeded by media_id):
- 86% unique "base" images: random smooth 2-D patterns (a 4x5 coarse
  random grid bilinearly upsampled to 32x24 RGB) — rich local
  structure, so dHashes spread ~uniformly over the 64-bit space
  (random-pair collisions at radius 6 are ~4.5e-12; a pure linear
  gradient would collapse every base to the same handful of hashes —
  measured: 678k bogus pairs at n=2000 with the naive generator).
- 8% planted near-dups: a base image + pixel noise (sigma 6) — the
  recompress/brightness analog; dHash flips a few comparison bits, so
  pairs land within the radius-6 contract.
- 6% "flat template" images: near-identical gray fills — the
  pathological bucket (every one hashes to ~the same phash). With the
  default max_bucket=5000 cap these EXCEED the cap, so the tier must
  quarantine the bucket (ledger rows, pairs excluded) instead of
  going quadratic — exactly the 100 TB skew story.

Phases (each timed, one JSON line at the end):
  1. generate     distributed mapInPandas -> parquet corpus
  2. phash        decode+fingerprint every row (the Arrow decode pass)
  3. pairs        image_neardup_pairs end-to-end + pair count
  4. ledger       fingerprint_hot_buckets rows under the default cap
  5. ingest loop  4 batches through ingest_media_batch against a
                  persistent index + a replay of the last batch
                  (must admit nothing new)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H = 32, 24
BASE_FRAC, DUP_FRAC = 0.86, 0.08  # rest: flat templates


def build_corpus(spark, n: int, path: str) -> None:
    import numpy as np
    import pandas as pd

    n_base = int(n * BASE_FRAC)
    n_dup = int(n * DUP_FRAC)
    w, h = W, H

    def gen(batches):
        # package import happens worker-side (cwd propagates in this
        # env; ship via spark.submit.pyFiles on a real cluster)
        from web3_flight_rpc_server_spark.multimodal.media import (
            _png_encode,
        )

        yi = np.linspace(0.0, 3.0 - 1e-9, h)
        xi = np.linspace(0.0, 4.0 - 1e-9, w)
        y0 = np.floor(yi).astype(int)
        x0 = np.floor(xi).astype(int)
        fy = (yi - y0)[:, None, None]
        fx = (xi - x0)[None, :, None]

        def base_px(seed: int) -> "np.ndarray":
            rng = np.random.default_rng(seed)
            coarse = rng.uniform(0.0, 255.0, size=(4, 5, 3))
            px = (
                coarse[y0][:, x0] * (1 - fy) * (1 - fx)
                + coarse[y0][:, x0 + 1] * (1 - fy) * fx
                + coarse[y0 + 1][:, x0] * fy * (1 - fx)
                + coarse[y0 + 1][:, x0 + 1] * fy * fx
            )
            return np.clip(px, 0, 255).astype(np.uint8)

        for pdf in batches:
            ids, kinds, blobs = [], [], []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid < n_base:
                    px = base_px(mid)
                elif mid < n_base + n_dup:
                    src = mid - n_base
                    noise = np.random.default_rng(10_000_000 + mid) \
                        .normal(0.0, 6.0, size=(h, w, 3))
                    px = np.clip(
                        base_px(src).astype(np.float64) + noise, 0, 255
                    ).astype(np.uint8)
                else:
                    # flat template: one of 3 near-identical gray fills
                    px = np.full((h, w, 3), 128 + (mid % 3), np.uint8)
                ids.append(mid)
                kinds.append("image")
                blobs.append(_png_encode(px))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": blobs}
            )

    spark.range(n).repartition(64).mapInPandas(
        gen, schema="media_id long, kind string, content binary"
    ).write.mode("overwrite").parquet(path)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/media_scale"
    from pyspark.sql import functions as F

    from web3_flight_rpc_server_spark.multimodal.neardup import (
        image_neardup_pairs,
        perceptual_hash,
    )
    from web3_flight_rpc_server_spark.operators.dedup import (
        fingerprint_hot_buckets,
        release_caches,
    )
    from web3_flight_rpc_server_spark.pipelines.media_curation import (
        ingest_media_batch,
    )
    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("media-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(out_dir, "corpus")
    index_path = os.path.join(out_dir, "media_idx")
    shutil.rmtree(out_dir, ignore_errors=True)

    res: dict = {"n_images": n}
    t0 = time.perf_counter()
    build_corpus(spark, n, corpus_path)
    res["generate_s"] = round(time.perf_counter() - t0, 2)
    media = spark.read.parquet(corpus_path)
    res["corpus_mb"] = round(sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path) if f.endswith(".parquet")
    ) / 1e6, 1)

    # phase 2: the decode+fingerprint pass alone (Arrow mapInPandas)
    t0 = time.perf_counter()
    n_fps = perceptual_hash(media).count()
    res["phash_s"] = round(time.perf_counter() - t0, 2)
    res["phash_rows"] = n_fps
    res["decode_rows_per_s"] = round(n_fps / res["phash_s"])

    # phase 3: pairs end-to-end under the default cap
    t0 = time.perf_counter()
    pairs = image_neardup_pairs(media)
    n_pairs = pairs.count()
    res["pairs_s"] = round(time.perf_counter() - t0, 2)
    res["pairs_found"] = n_pairs
    release_caches()

    # phase 4: the hot-bucket ledger the cap produced (the flat
    # templates must show up here, NOT in the pair output)
    fps = perceptual_hash(media)
    ledger = fingerprint_hot_buckets(
        fps, 6, id_col="media_id", fp_col="phash"
    ).collect()
    res["hot_buckets"] = len(ledger)
    res["hot_bucket_max_n"] = max((r.n_docs for r in ledger), default=0)
    release_caches()

    # phase 5: incremental ingest loop, 4 batches + replay
    batch_n = n // 4
    batch_times = []
    admitted_total = 0
    for b in range(4):
        lo, hi = b * batch_n, (b + 1) * batch_n
        batch = media.where(
            (F.col("media_id") >= lo) & (F.col("media_id") < hi)
        )
        t0 = time.perf_counter()
        rejects, admitted = ingest_media_batch(batch, index_path)
        admitted_total += admitted.count()
        batch_times.append(round(time.perf_counter() - t0, 2))
        release_caches()
    res["ingest_batch_s"] = batch_times
    res["ingest_rows_per_s"] = round(batch_n / (sum(batch_times) / 4))
    res["admitted_total"] = admitted_total
    # replay the last batch: at-least-once recovery must admit nothing
    last = media.where(F.col("media_id") >= 3 * batch_n)
    t0 = time.perf_counter()
    _, re_admitted = ingest_media_batch(last, index_path)
    res["replay_s"] = round(time.perf_counter() - t0, 2)
    res["replay_admitted"] = re_admitted.count()
    release_caches()

    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
