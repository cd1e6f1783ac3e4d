"""Per-batch progress heartbeat (SURVEY §2 T8).

The reference keeps the chat "typing…" indicator alive while a long
turn runs (telegram-agent.py:397-400, 411-416 — a background keepalive
thread poked per in-flight reply). The Spark-native analogue is a
`StreamingQueryListener`: the engine already emits a progress event
per micro-batch for every running query, so the heartbeat is an
observer on that bus — no polling thread, no per-task hook, and it
covers every query on the session at once.

The emitted dict is intentionally small and flat (query name, batch
id, rows, rates, watermark) so `emit` can be print, a log handler, or
the external-messaging boundary that feeds the typing indicator.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

EmitFn = Callable[[dict], None]


class HeartbeatListener(StreamingQueryListener):
    """Emits one heartbeat dict per micro-batch progress event.

    Lifecycle events (started / idle / terminated) are also surfaced —
    `idle` matters: it is the "still alive, nothing to do" signal that
    distinguishes a healthy quiet stream from a wedged one, which is
    exactly what a keepalive exists to tell apart.
    """

    def __init__(self, emit: EmitFn = print, keep_last: int = 1024) -> None:
        import collections

        self._emit = emit
        # bounded ring buffer: a long-lived stream emits one progress
        # event per trigger forever — an unbounded list would be a
        # driver-memory leak. `emit` is the durable path; this buffer
        # exists for tests and recent-state introspection only.
        self.events: collections.deque = collections.deque(maxlen=keep_last)

    def _fire(self, payload: dict) -> None:
        self.events.append(payload)
        try:
            self._emit(payload)
        except Exception:
            # a broken emitter must never kill the listener bus
            pass

    def onQueryStarted(self, event) -> None:
        self._fire({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._fire(
            {
                "event": "progress",
                "id": str(p.id),
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "timestamp": p.timestamp,
            }
        )

    def onQueryIdle(self, event) -> None:
        self._fire({"event": "idle", "id": str(event.id)})

    def onQueryTerminated(self, event) -> None:
        self._fire(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )


def attach_heartbeat(spark: SparkSession, emit: EmitFn = print) -> HeartbeatListener:
    """Register a heartbeat listener on the session's listener bus."""
    listener = HeartbeatListener(emit)
    spark.streams.addListener(listener)
    return listener


def detach_heartbeat(spark: SparkSession, listener: HeartbeatListener) -> None:
    spark.streams.removeListener(listener)
