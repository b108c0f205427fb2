"""Query lifecycle management (A16).

The reference tracks each client subscription by hand: register on a
virtual thread, remove + rebuild the upstream filter union on cancel
or send-error, idempotent close (LogsService.java:179-199,
Subscription.java:180-211, Producer.java:54-63). In Spark the
StreamingQuery handle and the StreamingQueryListener callbacks carry
the same lifecycle; this module packages them as a registry so a
serving layer can answer "what's running / what died and why" the
way the reference's subscription map did.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryRecord:
    query_id: str
    name: str | None
    started: bool = True
    terminated: bool = False
    exception: str | None = None
    progress_count: int = 0
    last_num_input_rows: int = 0


@dataclass
class QueryRegistry(StreamingQueryListener):
    """Listener keeping one record per streaming query (thread-safe;
    listener callbacks arrive on Spark's listener bus thread)."""

    records: dict[str, QueryRecord] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    # -- StreamingQueryListener ----------------------------------------
    def onQueryStarted(self, event):
        with self._lock:
            self.records[str(event.id)] = QueryRecord(
                query_id=str(event.id), name=event.name
            )

    def onQueryProgress(self, event):
        with self._lock:
            rec = self.records.get(str(event.progress.id))
            if rec:
                rec.progress_count += 1
                rec.last_num_input_rows = event.progress.numInputRows

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        with self._lock:
            rec = self.records.get(str(event.id))
            if rec:
                rec.terminated = True
                rec.exception = event.exception

    # -- registry API ---------------------------------------------------
    def active(self) -> list[QueryRecord]:
        with self._lock:
            return [r for r in self.records.values() if not r.terminated]

    def failed(self) -> list[QueryRecord]:
        with self._lock:
            return [
                r for r in self.records.values()
                if r.terminated and r.exception is not None
            ]

    def attach(self, spark: SparkSession) -> "QueryRegistry":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
