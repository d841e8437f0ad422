"""Streaming health metrics via StreamingQueryListener (T6, SURVEY.md
§2.9: the worker heartbeat at etl/worker.py:252-281 and SystemHealth at
database/models.py:139-146).

The reference's workers SETEX a Redis heartbeat every 60s; Spark's native
equivalent is the listener bus — every micro-batch emits a progress event
with rows/sec, batch duration, and state-store size, with no polling and
no extra query. The listener below keeps a bounded in-memory history and
derives the health verdict the reference's dashboard computes
(monitoring/dashboard.py:36-55); a production deployment would push each
event to a metrics sink instead."""

from __future__ import annotations

from collections import deque

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class HealthListener(StreamingQueryListener):
    """Bounded-history listener deriving per-query health stats."""

    def __init__(self, max_events: int = 100, max_batch_seconds: float = 30.0):
        self.events: deque = deque(maxlen=max_events)
        self._max_batch_seconds = max_batch_seconds

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.events.append(("started", event.id, None))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.events.append(
            (
                "progress",
                p.id,
                {
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    # business counters attached with DataFrame.observe ride
                    # the batch's own plan and surface here per micro-batch —
                    # the streaming form of operators/observability.py
                    "observed": dict(p.observedMetrics or {}),
                },
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.events.append(("terminated", event.id, None))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        self.events.append(("idle", event.id, None))

    def observed_totals(self, group: str, field: str) -> float:
        """Sum one observed metric across all recorded batches (e.g. the
        per-batch admission counts an ``observe`` on the stream emits)."""
        total = 0.0
        for kind, _, d in self.events:
            if kind == "progress" and d and group in d.get("observed", {}):
                total += d["observed"][group][field] or 0
        return total

    # -- derived health -----------------------------------------------------
    def summary(self) -> dict:
        progresses = [d for kind, _, d in self.events if kind == "progress" and d]
        total_rows = sum(p["num_input_rows"] or 0 for p in progresses)
        durations = [p["duration_ms"] for p in progresses if p["duration_ms"]]
        worst_s = max(durations, default=0) / 1000.0
        return {
            "n_batches": len(progresses),
            "total_input_rows": total_rows,
            "worst_batch_seconds": worst_s,
            "healthy": worst_s <= self._max_batch_seconds,
        }


def attach_health_listener(
    spark: SparkSession, max_batch_seconds: float = 30.0
) -> HealthListener:
    listener = HealthListener(max_batch_seconds=max_batch_seconds)
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: HealthListener) -> None:
    spark.streams.removeListener(listener)
