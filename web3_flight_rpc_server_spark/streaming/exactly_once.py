"""Exactly-once foreachBatch parquet sink via epoch commit markers.

Structured Streaming's native file sink is exactly-once through its
``_spark_metadata`` commit log, but it can only append the raw
micro-batch. Any ``foreachBatch`` pipeline — merge, dedup-against-
index, multi-sink fanout — downgrades to at-least-once: if the driver
dies between the batch's write and the checkpoint commit, the engine
REPLAYS the whole epoch on restart (the contract
operators/incremental.py:387 inherits and documents). The standard
production recovery is idempotence by epoch manifest:

- data lands under ``data/epoch=<batchId>/`` directories;
- a commit marker under ``_epochs/<batchId>`` is recorded only after
  the data write completes;
- a replayed epoch is detected by its marker and skipped wholesale;
- a RETRIED epoch (crash mid-write, no marker) first overwrites its
  own epoch directory, so torn partial output never becomes visible;
- readers resolve ONLY committed epochs, making uncommitted garbage
  invisible even between a crash and its retry.

Filesystem access goes through the Hadoop FileSystem API bound to the
output path's scheme, so the sink works unchanged on file:/, hdfs:/
and s3a:/ URIs. Marker commit is create-then-rename — atomic on HDFS
and local fs; on S3-class stores rename is copy+delete, so there the
marker should be a conditional put / commit-service call (documented
limitation, same one Spark's own HadoopMapReduceCommitProtocol
carries).

Reference parity: the reference re-sends from its high-water mark on
reconnect (server/src/main/java/net/broscorp/web3/subscription/
Subscription.java:96-109) and leaves dedup to the client; here the
sink itself is idempotent, so downstream consumers never see an epoch
twice no matter how the driver dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


class ExactlyOnceParquetSink:
    """``foreachBatch`` target: ``stream.writeStream.foreachBatch(sink)``.

    ``transform`` (optional) runs inside the epoch — the whole point of
    foreachBatch — and its output is what lands in the epoch dir, so
    the transform is covered by the same exactly-once guarantee.
    """

    def __init__(self, out_dir: str, transform=None):
        self.out_dir = out_dir.rstrip("/")
        self.data_dir = f"{self.out_dir}/data"
        self.epochs_dir = f"{self.out_dir}/_epochs"
        self.transform = transform

    def _marker(self, jvm, batch_id: int):
        return jvm.org.apache.hadoop.fs.Path(
            f"{self.epochs_dir}/{batch_id}"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, jvm = _fs(spark, self.out_dir)
        marker = self._marker(jvm, batch_id)
        if fs.exists(marker):
            return  # engine replay of a committed epoch: drop it whole
        out = self.transform(batch_df) if self.transform else batch_df
        # overwrite, not append: a retried epoch replaces its own torn
        # partial output instead of doubling it
        out.write.mode("overwrite").parquet(
            f"{self.data_dir}/epoch={batch_id}"
        )
        # create-then-rename marker commit (atomic on HDFS/local)
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{self.epochs_dir}/.{batch_id}.inprogress"
        )
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(self.epochs_dir))
        fs.create(tmp, True).close()
        if not fs.rename(tmp, marker):
            # a concurrent retry won the race; its data is identical
            # (same epoch), so losing the rename is benign — clean up
            fs.delete(tmp, False)

    def committed_epochs(self, spark: SparkSession) -> list[int]:
        fs, jvm = _fs(spark, self.out_dir)
        dirp = jvm.org.apache.hadoop.fs.Path(self.epochs_dir)
        if not fs.exists(dirp):
            return []
        out = []
        for st in fs.listStatus(dirp):
            name = st.getPath().getName()
            if not name.startswith("."):
                out.append(int(name))
        return sorted(out)


def read_committed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed epochs only, as one DataFrame with an ``epoch``
    partition column. Uncommitted/torn epoch dirs are never read —
    the reader trusts markers, not directory listings."""
    sink = ExactlyOnceParquetSink(out_dir)
    epochs = sink.committed_epochs(spark)
    if not epochs:
        raise ValueError(f"no committed epochs under {out_dir}")
    return (
        spark.read.option("basePath", sink.data_dir)
        .parquet(*[f"{sink.data_dir}/epoch={e}" for e in epochs])
    )
