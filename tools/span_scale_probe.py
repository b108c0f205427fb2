"""Scale probe for the span-index bucketed windows tier past the r13
17M-row point (r13 VERDICT #5): synthetic (h, doc_id) windows at
configurable sizes (default 17M and 170M — one more decade), plain vs
bucketed probe walls, per-batch append walls, and an append-batching
variant (accumulate-then-append) for the ~1 s/batch metastore append
overhead the r13 record names.

Synthetic windows are the honest shape for PROBE measurement: the
probe path touches only manifest + windows (the admission pipeline is
byte-identical across tiers, pinned in tests/test_span_index.py), and
generating 170M windows through real text ingestion would measure the
generator, not the index. h values are xxhash64 of a synthetic key so
the distribution matches real window hashes.

Usage:
  python tools/span_scale_probe.py [--rows 17000000,170000000]
      [--buckets 64,256] [--probe-rows 4200] [--reps 3]
      [--out-md] [--workdir /tmp/span_scale]

Prints one JSON line per (rows, tier/buckets) combination.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _windows_df(spark, rows: int):
    from pyspark.sql import functions as F

    return spark.range(rows).select(
        F.xxhash64(F.concat(F.lit("w"), F.col("id"))).alias("h"),
        (F.col("id") % 1_000_000).alias("doc_id"),
    )


def _probe_df(spark, rows: int, probe_rows: int):
    """probe_rows hashes that EXIST in the index (stride sample) —
    the left-semi hit-join shape the r13 measurement used."""
    from pyspark.sql import functions as F

    stride = max(1, rows // probe_rows)
    return spark.range(0, rows, stride).select(
        F.xxhash64(F.concat(F.lit("w"), F.col("id"))).alias("h"),
        (F.col("id") % 1_000_000).alias("doc_id"),
    )


def _fresh_batch(spark, base: int, n: int):
    from pyspark.sql import functions as F

    return spark.range(base, base + n).select(
        F.xxhash64(F.concat(F.lit("a"), F.col("id"))).alias("h"),
        (F.col("id") % 1_000_000).alias("doc_id"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="17000000,170000000")
    ap.add_argument("--buckets", default="64")
    ap.add_argument("--probe-rows", type=int, default=4200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--append-batch", type=int, default=4200)
    ap.add_argument("--batch-accumulate", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/span_scale")
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("span-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results = []

    for rows in [int(r) for r in args.rows.split(",")]:
        plain_dir = os.path.join(args.workdir, f"plain_{rows}")
        shutil.rmtree(plain_dir, ignore_errors=True)
        os.makedirs(plain_dir, exist_ok=True)
        _windows_df(spark, rows).write.mode("overwrite").parquet(
            plain_dir
        )
        probe = _probe_df(spark, rows, args.probe_rows).localCheckpoint()

        def timed_probe(idx_df):
            t0 = time.perf_counter()
            n = probe.join(idx_df, "h", "left_semi").count()
            return time.perf_counter() - t0, n

        plain = spark.read.parquet(plain_dir)
        walls = [round(timed_probe(plain)[0], 3)
                 for _ in range(args.reps)]
        # per-batch append wall on the plain tier
        ap_walls = []
        for i in range(args.reps):
            b = _fresh_batch(spark, i * args.append_batch,
                             args.append_batch)
            t0 = time.perf_counter()
            b.write.mode("append").parquet(plain_dir)
            ap_walls.append(round(time.perf_counter() - t0, 3))
        rec = {"rows": rows, "tier": "plain",
               "probe_walls_s": walls, "append_walls_s": ap_walls}
        print(json.dumps(rec), flush=True)
        results.append(rec)

        for buckets in [int(b) for b in args.buckets.split(",")]:
            table = f"span_scale_bt_{rows}_{buckets}"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            (
                spark.read.parquet(plain_dir)
                .repartition(buckets, "h")
                .write.bucketBy(buckets, "h").sortBy("h")
                .saveAsTable(table)
            )
            bt = spark.table(table)
            walls = [round(timed_probe(bt)[0], 3)
                     for _ in range(args.reps)]
            # per-batch bucketed append wall
            ap_walls = []
            for i in range(args.reps):
                b = _fresh_batch(spark, 10**9 + i * args.append_batch,
                                 args.append_batch)
                t0 = time.perf_counter()
                (
                    b.repartition(buckets, "h")
                    .write.mode("append")
                    .bucketBy(buckets, "h").sortBy("h")
                    .saveAsTable(table)
                )
                ap_walls.append(round(time.perf_counter() - t0, 3))
            # append-batching variant: accumulate K batches, append once
            big = _fresh_batch(
                spark, 2 * 10**9,
                args.append_batch * args.batch_accumulate,
            )
            t0 = time.perf_counter()
            (
                big.repartition(buckets, "h")
                .write.mode("append")
                .bucketBy(buckets, "h").sortBy("h")
                .saveAsTable(table)
            )
            batched_wall = round(time.perf_counter() - t0, 3)
            rec = {
                "rows": rows, "tier": "bucketed", "buckets": buckets,
                "probe_walls_s": walls, "append_walls_s": ap_walls,
                "batched_append": {
                    "batches_folded": args.batch_accumulate,
                    "wall_s": batched_wall,
                    "amortized_per_batch_s": round(
                        batched_wall / args.batch_accumulate, 3
                    ),
                },
            }
            print(json.dumps(rec), flush=True)
            results.append(rec)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(plain_dir, ignore_errors=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
