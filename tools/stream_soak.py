"""Month-scale streaming soak for the three compact_every twins
(VERDICT r10 next-round #5): hundreds of serial micro-batches through
operators/incremental.py:streaming_ingest (MinHash),
operators/fp_index.py:streaming_ingest_fingerprints and
operators/semdedup.py:streaming_ingest_embeddings, with in-loop
compaction (compact_every=25 by default), kill-and-restore at seeded
random epochs, and FORCED engine replays (the newest checkpoint commit
file is deleted before a restart, so Structured Streaming re-executes
the last batch — the at-least-once path every twin's replay-safety
contract is written against).

Measured per twin: data-file counts over time (bounded by the in-loop
compaction instead of growing per batch), probe latency sampled every
`--sample-every` batches against the live index, and CONVERGENCE —
after all batches + kills + replays, the index holds exactly the
planted unique population once (planted duplicates rejected, replays
admitted nothing twice).

Usage:
  python tools/stream_soak.py [--batches 500] [--compact-every 25]
      [--twins minhash,fp,semantic] [--kills 5] [--rows-per-batch 6]
      [--sample-every 100] [--out STREAM_SOAK.json]

One JSON line per twin on stdout; the full record (latency series,
file-count series, kill epochs) lands in --out.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def n_data_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        if ".compacting" in root or "_manifest" in root:
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def force_replay(ckpt: str) -> int | None:
    """Delete the newest commit marker so the restarted query
    re-executes its last batch (at-least-once replay injection).
    Returns the replayed batch id, or None when no batch committed."""
    commits = os.path.join(ckpt, "commits")
    if not os.path.isdir(commits):
        return None
    ids = [int(f) for f in os.listdir(commits) if f.isdigit()]
    if not ids:
        return None
    newest = max(ids)
    os.remove(os.path.join(commits, str(newest)))
    # Hadoop's local ChecksumFs keeps a hidden `.N.crc` sidecar per
    # commit file; leaving it behind makes the restarted query's
    # commit rename fail with FileAlreadyExistsException, which Spark
    # surfaces as the misleading "Multiple streaming queries are
    # concurrently using <ckpt>/commits" error.
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return newest


class TwinSoak:
    """Drives one twin: phase-feed batch files -> processAllAvailable
    -> (at kill epochs) stop, inject a forced replay, restart."""

    name: str

    def __init__(self, spark, root: str, compact_every: int,
                 rows_per_batch: int):
        self.spark = spark
        self.root = root
        self.src = os.path.join(root, "src")
        self.ckpt = os.path.join(root, "ckpt")
        self.idx = os.path.join(root, "idx")
        self.compact_every = compact_every
        self.rows = rows_per_batch
        os.makedirs(self.src, exist_ok=True)

    # --- twin-specific hooks -----------------------------------------
    def batch_rows(self, batch_id: int) -> list:
        raise NotImplementedError

    def schema(self) -> str:
        raise NotImplementedError

    def start(self):
        raise NotImplementedError

    def probe_once(self) -> float:
        raise NotImplementedError

    def unique_population(self, n_batches: int) -> int:
        raise NotImplementedError

    def index_distinct_ids(self) -> int:
        raise NotImplementedError

    # --- driver -------------------------------------------------------
    def write_batch(self, batch_id: int) -> None:
        self.spark.createDataFrame(
            self.batch_rows(batch_id), self.schema()
        ).coalesce(1).write.parquet(
            os.path.join(self.src, f"b{batch_id:05d}")
        )

    def stream_df(self):
        return (
            self.spark.readStream.schema(self.schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(self.src, "*"))
        )

    def run(self, n_batches: int, kills: int, sample_every: int,
            seed: int = 11) -> dict:
        rng = random.Random(seed)
        kill_epochs = sorted(
            rng.sample(range(2, n_batches - 1), kills)
        ) if kills else []
        record = {
            "twin": self.name, "batches": n_batches,
            "compact_every": self.compact_every,
            "kill_epochs": kill_epochs, "replayed_batches": [],
            "file_counts": [], "probe_latency_s": [],
        }
        q = self.start()
        t_begin = time.perf_counter()
        try:
            for b in range(n_batches):
                self.write_batch(b)
                q.processAllAvailable()
                if b in kill_epochs:
                    q.stop()
                    replayed = force_replay(self.ckpt)
                    if replayed is not None:
                        record["replayed_batches"].append(replayed)
                    q = self.start()
                    q.processAllAvailable()
                if (b + 1) % sample_every == 0 or b == n_batches - 1:
                    record["file_counts"].append(
                        {"batch": b + 1, "files": self.count_files()}
                    )
                    record["probe_latency_s"].append(
                        {"batch": b + 1,
                         "sec": round(self.probe_once(), 3)}
                    )
                    print(f"[{self.name}] batch {b + 1}/{n_batches} "
                          f"files={record['file_counts'][-1]['files']} "
                          f"probe={record['probe_latency_s'][-1]['sec']}s",
                          file=sys.stderr)
        finally:
            q.stop()
        record["wall_s"] = round(time.perf_counter() - t_begin, 1)
        expected = self.unique_population(n_batches)
        got = self.index_distinct_ids()
        record["expected_unique"] = expected
        record["index_distinct_ids"] = got
        record["index_total_rows_per_id_ok"] = self.no_duplicate_ids()
        record["converged"] = (got == expected
                               and record["index_total_rows_per_id_ok"])
        return record

    def no_duplicate_ids(self) -> bool:
        raise NotImplementedError

    def count_files(self) -> int:
        return n_data_files(self.idx)


class MinhashSoak(TwinSoak):
    """Docs with disjoint per-id vocabulary; every 5th row replays an
    earlier ORIGINAL doc's payload (i - 4: always a non-dup row, so
    its content is really in the index) under a fresh id — a planted
    near-dup the index must reject. Replaying i - 5 would target
    another dup row whose own payload was substituted, i.e. content
    never ingested, and the "dup" would be legitimately admitted."""

    name = "minhash"

    def _text(self, uid: int) -> str:
        return " ".join(f"tok{uid}x{j}" for j in range(12))

    def batch_rows(self, batch_id: int) -> list:
        rows = []
        for r in range(self.rows):
            i = batch_id * self.rows + r
            if i % 5 == 4 and i >= 5:
                rows.append((1_000_000 + i, self._text(i - 4)))  # dup
            else:
                rows.append((i, self._text(i)))
        return rows

    def schema(self) -> str:
        return "doc_id long, text string"

    def start(self):
        from web3_flight_rpc_server_spark.operators.incremental import (
            streaming_ingest,
        )

        return streaming_ingest(
            self.stream_df(), self.idx, self.ckpt, threshold=0.5,
            compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.incremental import (
            dedup_against_index,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._text(0)), (9_999_998, self._text(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        dedup_against_index(probe, self.idx, threshold=0.5).count()
        return time.perf_counter() - t0

    def unique_population(self, n_batches: int) -> int:
        n = n_batches * self.rows
        return sum(1 for i in range(n) if not (i % 5 == 4 and i >= 5))

    def index_distinct_ids(self) -> int:
        return (
            self.spark.read.parquet(self.idx + "/shingles")
            .select("doc_id").distinct().count()
        )

    def no_duplicate_ids(self) -> bool:
        df = self.spark.read.parquet(self.idx + "/shingles")
        return df.groupBy("doc_id").count().where("count > 1").count() == 0


class FpSoak(TwinSoak):
    """Distinct 64-bit fingerprints (id-derived, pairwise far apart);
    every 5th row replays an earlier fingerprint under a fresh id."""

    name = "fp"

    def _fp(self, uid: int) -> int:
        # spread bits so pairwise Hamming stays far above the radius
        x = (uid * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
        return x

    def batch_rows(self, batch_id: int) -> list:
        rows = []
        for r in range(self.rows):
            i = batch_id * self.rows + r
            if i % 5 == 4 and i >= 5:
                rows.append((1_000_000 + i, self._fp(i - 4)))
            else:
                rows.append((i, self._fp(i)))
        return rows

    def schema(self) -> str:
        return "media_id long, phash long"

    def start(self):
        from web3_flight_rpc_server_spark.operators.fp_index import (
            streaming_ingest_fingerprints,
        )

        return streaming_ingest_fingerprints(
            self.stream_df(), self.idx, self.ckpt, max_hamming=6,
            compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.fp_index import (
            dedup_fingerprints_against_index,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._fp(0)), (9_999_998, self._fp(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        dedup_fingerprints_against_index(
            probe, self.idx, id_col="media_id"
        ).count()
        return time.perf_counter() - t0

    def unique_population(self, n_batches: int) -> int:
        n = n_batches * self.rows
        return sum(1 for i in range(n) if not (i % 5 == 4 and i >= 5))

    def index_distinct_ids(self) -> int:
        return (
            self.spark.read.parquet(self.idx + "/chunks")
            .select("id").distinct().count()
        )

    def no_duplicate_ids(self) -> bool:
        # HmSearch pigeonhole blocking stores one row per 16-bit
        # chunk_idx per fingerprint; "no duplicate entries" means no
        # (id, chunk_idx) row appended twice
        df = self.spark.read.parquet(self.idx + "/chunks")
        return (
            df.groupBy("id", "chunk_idx").count()
            .where("count > 1").count() == 0
        )


class MinhashBtSoak(MinhashSoak):
    """The MinHash soak through the bucketed-metastore bands tier
    (bands_table= — probes shuffle only the batch side) with the r14
    in-loop swap_table compaction: identical planted stream and
    convergence oracle as the plain twin, file counts including the
    warehouse table so the series shows the fold bounding the
    per-append growth (the exact gap r13 VERDICT #1 named)."""

    name = "minhash_bt"
    TABLE = "soak_minhash_bands_bt"

    def _bands(self):
        # compaction swaps the table from the streaming clone session;
        # an external reader refreshes first (documented changed-table
        # semantics, same as the span_bt twin)
        self.spark.catalog.refreshTable(self.TABLE)
        return self.spark.table(self.TABLE)

    def start(self):
        from web3_flight_rpc_server_spark.operators.incremental import (
            streaming_ingest,
        )

        if not os.path.isdir(os.path.join(self.idx, "manifest")):
            self.spark.sql(f"DROP TABLE IF EXISTS {self.TABLE}")
        return streaming_ingest(
            self.stream_df(), self.idx, self.ckpt, threshold=0.5,
            compact_every=self.compact_every,
            bands_table=self.TABLE, buckets=16,
        )

    def no_duplicate_ids(self) -> bool:
        sh = self.spark.read.parquet(self.idx + "/shingles")
        return (
            self._bands().groupBy("doc_id", "band").count()
            .where("count > 1").count() == 0
            and sh.groupBy("doc_id").count()
            .where("count > 1").count() == 0
        )

    def count_files(self) -> int:
        return n_data_files(self.idx) + len(self._bands().inputFiles())


class FpBtSoak(FpSoak):
    """The fingerprint soak through the bucketed-metastore chunks tier
    (chunks_table=) with the r14 in-loop swap_table compaction — same
    contract as MinhashBtSoak."""

    name = "fp_bt"
    TABLE = "soak_fp_chunks_bt"

    def _chunks(self):
        self.spark.catalog.refreshTable(self.TABLE)
        return self.spark.table(self.TABLE)

    def start(self):
        from web3_flight_rpc_server_spark.operators.fp_index import (
            streaming_ingest_fingerprints,
        )

        if not os.path.isdir(os.path.join(self.idx, "manifest")):
            self.spark.sql(f"DROP TABLE IF EXISTS {self.TABLE}")
        return streaming_ingest_fingerprints(
            self.stream_df(), self.idx, self.ckpt, max_hamming=6,
            compact_every=self.compact_every,
            chunks_table=self.TABLE, buckets=16,
        )

    def index_distinct_ids(self) -> int:
        return self._chunks().select("id").distinct().count()

    def no_duplicate_ids(self) -> bool:
        return (
            self._chunks().groupBy("id", "chunk_idx").count()
            .where("count > 1").count() == 0
        )

    def count_files(self) -> int:
        return n_data_files(self.idx) + len(self._chunks().inputFiles())


class SemanticSoak(TwinSoak):
    """Seeded random unit vectors (dim 16 — random pairs sit far below
    the 0.92 threshold); every 5th row replays an earlier vector under
    a fresh id (cosine 1.0 with its first copy -> rejected)."""

    name = "semantic"
    DIM = 16
    _model = None

    def _vec(self, uid: int) -> list[float]:
        rng = random.Random(7_000_000 + uid)
        v = [rng.gauss(0, 1) for _ in range(self.DIM)]
        nrm = sum(x * x for x in v) ** 0.5
        return [x / nrm for x in v]

    def batch_rows(self, batch_id: int) -> list:
        rows = []
        for r in range(self.rows):
            i = batch_id * self.rows + r
            if i % 5 == 4 and i >= 5:
                rows.append((1_000_000 + i, self._vec(i - 4)))
            else:
                rows.append((i, self._vec(i)))
        return rows

    def schema(self) -> str:
        return "vec_id long, embedding array<double>"

    def start(self):
        from web3_flight_rpc_server_spark.operators.kmeans import (
            kmeans_fit,
        )
        from web3_flight_rpc_server_spark.operators.semdedup import (
            streaming_ingest_embeddings,
        )

        # trained-index bootstrap needs a model; fit once on a seeded
        # sample of the planted population (manifest wins on restarts)
        if self._model is None:
            sample = self.spark.createDataFrame(
                [(i, self._vec(i)) for i in range(64)], self.schema()
            )
            self._model = kmeans_fit(sample, k=4)
        return streaming_ingest_embeddings(
            self.stream_df(), self.idx, self.ckpt, threshold=0.92,
            model=self._model, compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.semdedup import (
            dedup_embeddings_against_index,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._vec(0)), (9_999_998, self._vec(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        dedup_embeddings_against_index(probe, self.idx, 0.92).count()
        return time.perf_counter() - t0

    def unique_population(self, n_batches: int) -> int:
        n = n_batches * self.rows
        return sum(1 for i in range(n) if not (i % 5 == 4 and i >= 5))

    def index_distinct_ids(self) -> int:
        # the semantic index is cell=N partition dirs at the root
        # (no chunks/ subdir); _kmeans_manifest is underscore-ignored
        return (
            self.spark.read.parquet(self.idx)
            .select("vec_id").distinct().count()
        )

    def no_duplicate_ids(self) -> bool:
        # one vec_id legitimately lands in top_m cells; "no duplicate
        # entries" means no (vec_id, cell) row appended twice
        df = self.spark.read.parquet(self.idx)
        return (
            df.groupBy("vec_id", "cell").count()
            .where("count > 1").count() == 0
        )


class ContSoak(TwinSoak):
    """Persistent containment index (operators/cont_index.py, r14):
    docs with disjoint per-id 14-token vocabulary; every 5th row
    replays an earlier ORIGINAL doc's full text under a fresh id — an
    exact copy, contained both ways in the indexed original, so the
    min-id rule rejects the newcomer. Convergence: the shingles
    dataset holds exactly the originals once each and the fps dataset
    has no duplicate (fp, owner) rows across kills and forced
    replays."""

    name = "cont"

    def _text(self, uid: int) -> str:
        # long-ish tokens so each doc carries >= w + k - 1 contiguous
        # chars and the winnowing guarantee applies
        return " ".join(f"token{uid}word{j}item" for j in range(14))

    def batch_rows(self, batch_id: int) -> list:
        rows = []
        for r in range(self.rows):
            i = batch_id * self.rows + r
            if i % 5 == 4 and i >= 5:
                rows.append((1_000_000 + i, self._text(i - 4)))
            else:
                rows.append((i, self._text(i)))
        return rows

    def schema(self) -> str:
        return "doc_id long, text string"

    def start(self):
        from web3_flight_rpc_server_spark.operators.cont_index import (
            streaming_ingest_containment,
        )

        return streaming_ingest_containment(
            self.stream_df(), self.idx, self.ckpt, threshold=0.8,
            compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.cont_index import (
            containment_against_index,
        )
        from web3_flight_rpc_server_spark.operators.dedup import (
            release_caches,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._text(0)), (9_999_998, self._text(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        containment_against_index(probe, self.idx, 0.8).count()
        dt = time.perf_counter() - t0
        release_caches()
        return dt

    def unique_population(self, n_batches: int) -> int:
        n = n_batches * self.rows
        return sum(1 for i in range(n) if not (i % 5 == 4 and i >= 5))

    def index_distinct_ids(self) -> int:
        return (
            self.spark.read.parquet(self.idx + "/shingles")
            .select("doc_id").distinct().count()
        )

    def no_duplicate_ids(self) -> bool:
        fps = self.spark.read.parquet(self.idx + "/fps")
        sh = self.spark.read.parquet(self.idx + "/shingles")
        return (
            fps.groupBy("fp", "doc_id").count()
            .where("count > 1").count() == 0
            and sh.groupBy("doc_id").count()
            .where("count > 1").count() == 0
        )


class ClfGateSoak(TwinSoak):
    """A TRAINED damping='none' classifier gates the ingest stream
    (pipelines/streaming_curation.py:gate_stream(clf_model=...)) —
    the r11 trained-gate path gets the same durability drill as the
    index twins (r11 VERDICT #5). Planted stream: alternating
    good-template / bad-template docs, each carrying a unique suffix
    token (so hash-collision noise rides every row, like real text).
    Survivors land in a parquet FileStreamSink whose metadata log is
    the exactly-once seam the kill/forced-replay injections attack.

    Convergence oracle: the SAME gate evaluated in one batch pass
    over the full planted population (the batch==in-row exactness
    contract from tests/test_streaming_curation.py) — the sink must
    hold exactly that id set, each id once, across kills and replays.
    Class alignment (good admitted / bad rejected) is recorded as
    evidence the gate discriminates, not just dedups."""

    name = "clf"
    GOOD = "alpha beta gamma delta "
    BAD = "junk noise bad lorem "
    _model = None

    def _text(self, uid: int) -> str:
        base = self.GOOD if uid % 2 == 0 else self.BAD
        return (base * 8) + f"uid{uid}"

    def batch_rows(self, batch_id: int) -> list:
        return [
            (i, self._text(i), "x")
            for i in range(batch_id * self.rows,
                           (batch_id + 1) * self.rows)
        ]

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def _cfg(self):
        from web3_flight_rpc_server_spark.pipelines.curation import (
            CurationConfig,
        )

        return CurationConfig(
            allowed_langs=("unknown",), min_quality=0.0,
            min_clf_score=0.5,
        )

    def _get_model(self):
        if ClfGateSoak._model is None:
            from web3_flight_rpc_server_spark.operators.classifier import (
                logreg_fit,
            )

            labeled = self.spark.createDataFrame(
                [(i, self._text(i), "x", 1 - (i % 2)) for i in range(40)],
                "doc_id long, text string, lang string, label int",
            )
            ClfGateSoak._model = logreg_fit(
                labeled, "label", buckets=128, iters=8, lr=1.0,
                damping="none",
            )
        return ClfGateSoak._model

    def start(self):
        from web3_flight_rpc_server_spark.pipelines.streaming_curation import (  # noqa: E501
            gate_stream,
        )

        gated = gate_stream(self.stream_df(), self._cfg(),
                            clf_model=self._get_model())
        return (
            gated.writeStream.format("parquet")
            .option("path", self.idx)
            .option("checkpointLocation", self.ckpt)
            .start()
        )

    def probe_once(self) -> float:
        # in-row scorer latency on a 2-doc batch through the same gate
        from web3_flight_rpc_server_spark.pipelines.streaming_curation import (  # noqa: E501
            gate_stream,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._text(0), "x"),
             (9_999_998, self._text(1), "x")],
            self.schema(),
        )
        t0 = time.perf_counter()
        gate_stream(probe, self._cfg(), clf_model=self._get_model()).count()
        return time.perf_counter() - t0

    def _batch_oracle(self, n_batches: int):
        from web3_flight_rpc_server_spark.pipelines.streaming_curation import (  # noqa: E501
            gate_stream,
        )

        n = n_batches * self.rows
        planted = self.spark.createDataFrame(
            [(i, self._text(i), "x") for i in range(n)], self.schema()
        )
        return {
            r.doc_id
            for r in gate_stream(
                planted, self._cfg(), clf_model=self._get_model()
            ).select("doc_id").collect()
        }

    def unique_population(self, n_batches: int) -> int:
        self._oracle_ids = self._batch_oracle(n_batches)
        self._n_planted = n_batches * self.rows
        return len(self._oracle_ids)

    def index_distinct_ids(self) -> int:
        sink = {
            r.doc_id
            for r in self.spark.read.parquet(self.idx)
            .select("doc_id").collect()
        }
        self._sink_ids = sink
        # convergence demands the exact SET, not just matching counts
        if hasattr(self, "_oracle_ids") and sink != self._oracle_ids:
            return -1
        return len(sink)

    def no_duplicate_ids(self) -> bool:
        df = self.spark.read.parquet(self.idx)
        return df.groupBy("doc_id").count().where("count > 1").count() == 0

    def run(self, n_batches: int, kills: int, sample_every: int,
            seed: int = 11) -> dict:
        rec = super().run(n_batches, kills, sample_every, seed)
        good = {i for i in range(self._n_planted) if i % 2 == 0}
        rec["planted"] = self._n_planted
        rec["expected_good"] = len(good)
        rec["admitted_good"] = len(self._sink_ids & good)
        rec["admitted_bad"] = len(self._sink_ids - good)
        return rec


class SpanSoak(TwinSoak):
    """Persistent span index (operators/span_index.py): docs with
    disjoint per-id 12-token vocabulary; every 5th row replays an
    earlier ORIGINAL doc's full text under a fresh id — an exact copy
    whose every k=6 window is in the index, so it must be rejected
    ``all_spans_duplicated``. Convergence: the admitted dataset holds
    exactly the originals once each, and the windows dataset has no
    duplicate (h, owner) rows across kills and forced replays."""

    name = "span"
    K = 6

    def _text(self, uid: int) -> str:
        return " ".join(f"tok{uid}x{j}" for j in range(12))

    def batch_rows(self, batch_id: int) -> list:
        rows = []
        for r in range(self.rows):
            i = batch_id * self.rows + r
            if i % 5 == 4 and i >= 5:
                rows.append((1_000_000 + i, self._text(i - 4)))
            else:
                rows.append((i, self._text(i)))
        return rows

    def schema(self) -> str:
        return "doc_id long, text string"

    def start(self):
        from web3_flight_rpc_server_spark.operators.span_index import (
            streaming_ingest_spans,
        )

        return streaming_ingest_spans(
            self.stream_df(), self.idx, self.ckpt, k=self.K,
            compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.span_index import (
            _windows,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._text(0)), (9_999_998, self._text(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        w = _windows(probe, self.K, "doc_id", "text")
        idx = self.spark.read.parquet(self.idx + "/windows")
        w.join(idx, "h", "left_semi").count()
        return time.perf_counter() - t0

    def unique_population(self, n_batches: int) -> int:
        n = n_batches * self.rows
        return sum(1 for i in range(n) if not (i % 5 == 4 and i >= 5))

    def index_distinct_ids(self) -> int:
        return (
            self.spark.read.parquet(self.idx + "/admitted")
            .select("doc_id").distinct().count()
        )

    def no_duplicate_ids(self) -> bool:
        w = self.spark.read.parquet(self.idx + "/windows")
        a = self.spark.read.parquet(self.idx + "/admitted")
        return (
            w.groupBy("h", "doc_id").count().where("count > 1")
            .count() == 0
            and a.groupBy("doc_id").count().where("count > 1")
            .count() == 0
        )


class SpanBtSoak(SpanSoak):
    """The span soak through the r13 bucketed-metastore windows tier
    (windows_table= — probes shuffle only the batch side): identical
    planted stream and convergence oracle as the plain twin, so a
    green run shows the replay/self-healing semantics survive the
    tier end-to-end, not just in the pytest crash drill."""

    name = "span_bt"
    TABLE = "soak_span_windows_bt"

    def _win(self):
        # the swap compaction replaces the table's files from the
        # streaming clone session; THIS session's relation cache is
        # per-session, so an external reader refreshes first —
        # standard Spark changed-table semantics (documented in
        # compact_span_index)
        self.spark.catalog.refreshTable(self.TABLE)
        return self.spark.table(self.TABLE)

    def start(self):
        from web3_flight_rpc_server_spark.operators.span_index import (
            streaming_ingest_spans,
        )

        # fresh soak (no manifest yet): drop a stale table from a
        # previous run so the bootstrap's errorifexists can't trip;
        # restarts after kills keep the live table (manifest exists)
        if not os.path.isdir(os.path.join(self.idx, "manifest")):
            self.spark.sql(f"DROP TABLE IF EXISTS {self.TABLE}")
        return streaming_ingest_spans(
            self.stream_df(), self.idx, self.ckpt, k=self.K,
            compact_every=self.compact_every,
            windows_table=self.TABLE, buckets=16,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.operators.span_index import (
            _windows,
        )

        probe = self.spark.createDataFrame(
            [(9_999_999, self._text(0)), (9_999_998, self._text(1))],
            self.schema(),
        )
        t0 = time.perf_counter()
        w = _windows(probe, self.K, "doc_id", "text")
        w.join(self._win(), "h", "left_semi").count()
        return time.perf_counter() - t0

    def no_duplicate_ids(self) -> bool:
        a = self.spark.read.parquet(self.idx + "/admitted")
        return (
            self._win().groupBy("h", "doc_id").count()
            .where("count > 1").count() == 0
            and a.groupBy("doc_id").count().where("count > 1")
            .count() == 0
        )

    def count_files(self) -> int:
        # the windows dataset lives in the warehouse table, not under
        # idx/ — count BOTH so the series shows the metastore-swap
        # compaction bounding the per-append file growth
        return n_data_files(self.idx) + len(self._win().inputFiles())


class EoGateSoak(TwinSoak):
    """Gated ingest through the epoch-manifest exactly-once sink with
    in-loop epoch compaction (pipelines/streaming_curation.py:
    gated_ingest_exactly_once — r12 VERDICT #6: the FileStreamSink
    variant grows one file per batch by design; this endpoint bounds
    it). Odd ids carry a blocklisted token and must never land; the
    committed view must equal the batch-oracle survivor set exactly
    through kills and forced replays, with file counts bounded by the
    in-loop compaction."""

    name = "eo"

    def _text(self, uid: int) -> str:
        body = " ".join(f"alpha{uid}x{j} beta{j}" for j in range(6))
        bad = " badword" if uid % 2 else ""
        return f"doc {uid} {body}{bad}"

    def batch_rows(self, batch_id: int) -> list:
        return [
            (i, self._text(i), "x")
            for i in range(batch_id * self.rows,
                           (batch_id + 1) * self.rows)
        ]

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def _cfg(self):
        from web3_flight_rpc_server_spark.pipelines.curation import (
            CurationConfig,
        )

        # synthetic tokens hit no stopwords -> lang "unknown" (the
        # clf twin's convention); odd ids carry the blocklisted token
        return CurationConfig(allowed_langs=("unknown",),
                              min_quality=0.0, blocklist=("badword",))

    def start(self):
        from web3_flight_rpc_server_spark.pipelines.streaming_curation import (  # noqa: E501
            gated_ingest_exactly_once,
        )

        return gated_ingest_exactly_once(
            self.stream_df(), self.idx, self.ckpt, cfg=self._cfg(),
            compact_every=self.compact_every,
        )

    def probe_once(self) -> float:
        from web3_flight_rpc_server_spark.streaming.exactly_once import (
            read_committed,
        )

        t0 = time.perf_counter()
        read_committed(self.spark, self.idx).count()
        return time.perf_counter() - t0

    def _committed(self):
        from web3_flight_rpc_server_spark.streaming.exactly_once import (
            read_committed,
        )

        return read_committed(self.spark, self.idx)

    def unique_population(self, n_batches: int) -> int:
        from web3_flight_rpc_server_spark.pipelines.streaming_curation import (  # noqa: E501
            gate_stream,
        )

        planted = self.spark.createDataFrame(
            [(i, self._text(i), "x")
             for i in range(n_batches * self.rows)], self.schema()
        )
        self._oracle_ids = {
            r.doc_id for r in gate_stream(planted, self._cfg())
            .select("doc_id").collect()
        }
        self._n_planted = n_batches * self.rows
        return len(self._oracle_ids)

    def index_distinct_ids(self) -> int:
        sink = {r.doc_id for r in
                self._committed().select("doc_id").collect()}
        self._sink_ids = sink
        if hasattr(self, "_oracle_ids") and sink != self._oracle_ids:
            return -1
        return len(sink)

    def no_duplicate_ids(self) -> bool:
        return (
            self._committed().groupBy("doc_id").count()
            .where("count > 1").count() == 0
        )

    def run(self, n_batches: int, kills: int, sample_every: int,
            seed: int = 11) -> dict:
        rec = super().run(n_batches, kills, sample_every, seed)
        good = {i for i in range(self._n_planted) if i % 2 == 0}
        rec["planted"] = self._n_planted
        rec["expected_good"] = len(good)
        rec["admitted_good"] = len(self._sink_ids & good)
        rec["admitted_bad"] = len(self._sink_ids - good)
        return rec


TWINS = {"minhash": MinhashSoak, "fp": FpSoak, "semantic": SemanticSoak,
         "clf": ClfGateSoak, "span": SpanSoak, "span_bt": SpanBtSoak,
         "eo": EoGateSoak, "minhash_bt": MinhashBtSoak,
         "fp_bt": FpBtSoak, "cont": ContSoak}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=500)
    ap.add_argument("--compact-every", type=int, default=25)
    ap.add_argument("--twins", default="minhash,fp,semantic")
    ap.add_argument("--kills", type=int, default=5)
    ap.add_argument("--rows-per-batch", type=int, default=6)
    ap.add_argument("--sample-every", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/stream_soak")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "STREAM_SOAK.json"))
    args = ap.parse_args()

    from web3_flight_rpc_server_spark.session import get_spark

    spark = get_spark("stream-soak")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    ok = True
    for twin in args.twins.split(","):
        root = os.path.join(args.workdir, twin)
        shutil.rmtree(root, ignore_errors=True)
        soak = TWINS[twin](spark, root, args.compact_every,
                           args.rows_per_batch)
        rec = soak.run(args.batches, args.kills, args.sample_every)
        results.append(rec)
        ok = ok and rec["converged"]
        print(json.dumps({k: rec[k] for k in (
            "twin", "batches", "wall_s", "converged", "expected_unique",
            "index_distinct_ids", "replayed_batches", "kill_epochs")}))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
