"""Streaming progress metrics listener (DataX speed reporting analog).

DataX merges Communication counters task -> taskGroup -> job and prints
speed every 10 s (core/.../communication/CommunicationTool.java:56-108,
TaskGroupContainer.java:253-266). Structured Streaming already computes
the same vocabulary per micro-batch; this listener persists it as JSONL
so jobs have a machine-readable speed/progress trail alongside the
engine's own per-batch BatchMetrics.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressJsonListener(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event."""

    def __init__(self, path: str):
        self.path = path

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "timestamp": p.timestamp,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {"event": "terminated", "id": str(event.id),
             "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:
        pass

    def _write(self, d: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(d, default=str, sort_keys=True) + "\n")
