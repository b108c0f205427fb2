"""SparkSession construction and runtime configuration.

Two entry paths:

- ``get_spark()``      build a local session with scale-appropriate
                       defaults (tests, bench).
- ``configure(spark)`` apply the runtime confs this engine needs to an
                       externally-created session (the driver owns its
                       session; we only set runtime-settable confs).

Scale notes (100 TB target): AQE is on so skewed shuffle partitions are
split and tiny ones coalesced at runtime; shuffle partition count
defaults to the local core count but on a real cluster should be
~2-3x total executor cores (or left to AQE's
``spark.sql.adaptive.coalescePartitions.initialPartitionNum``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs the engine relies on. Applied defensively to
# any session handed to us (driver-owned sessions included).
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark has no
    # ns timestamp type, so read as raw ns-long and convert in the
    # loader (tables.py) — see FIXTURES.md determinism rules.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; pin the session zone so any
    # ltz<->ntz hop is identity.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas()/pandas_udf interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime coalesce/skew-split of shuffle partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Text/vector operators are CPU-heavy per byte (shingling, hashing,
    # higher-order fns); AQE's size-based coalescing would collapse
    # their small-by-bytes shuffles to 1-2 partitions and serialize the
    # compute. A small floor keeps parallelism without losing AQE.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment; engine still works for
            # everything except ns-timestamp parquet reads.
            pass
    return spark


def get_spark(app_name: str = "web3-flight-rpc-server-spark",
              cpus: int | None = None) -> SparkSession:
    """Local session sized from $SPARK_GRAFT_CPUS (default all cores)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        # Scan-split sizing for the LOCAL profile: fixture tables are
        # single parquet files, so the 128 MB default gives a ~200 MB
        # fact table only 2 input splits — 2 of N cores scanning while
        # the rest idle (measured: the sf1 snowflake join drops 1.1 s
        # -> 0.67 s at 32 MB splits). In local mode smaller splits
        # cost only scheduler overhead (no shuffle-service/network
        # amplification), so parallelism wins. A real cluster keeps
        # the 128 MB default: its inputs arrive as many files and
        # oversized task counts DO tax the scheduler at 100 TB —
        # this conf is deliberately in the local builder, not
        # RUNTIME_CONFS, so externally-owned sessions are untouched.
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # FAIR task scheduling so concurrent jobs (e.g. parallel Flight
        # do_get requests, each in its own on-demand pool) share the
        # cluster round-robin instead of head-of-line blocking behind
        # a large earlier scan — the reference serves its subscriptions
        # concurrently (one virtual thread each, Subscription.java).
        # Static conf: only applies at context creation; pool tagging
        # in the Flight server degrades harmlessly to FIFO otherwise.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package's source to executors via ``addPyFile`` — the
    local-mode equivalent of a real deployment's ``--py-files`` wheel.

    Most of the engine keeps Python workers import-free (closures are
    nested or capture plain values by design — operators/semdedup.py's
    kernels, the SYNM codec), but the MULTIMODAL decode path
    legitimately imports the package on executors (the PNG/JPEG/WAV
    decoders and resize kernels are real modules, not closure-sized
    helpers). That import resolves from the driver's cwd in local mode
    — which breaks the moment a driver-owned session runs from another
    directory (the round driver does exactly that). Shipping the
    package as a py-file makes worker imports location-independent,
    identical to how a 1000-executor cluster would receive the code.

    Idempotent per SparkContext; the zip is built once per process."""
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_w3frs_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"w3frs_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._w3frs_pkg_shipped = True
