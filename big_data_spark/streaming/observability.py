"""Streaming observability: a StreamingQueryListener that captures
per-micro-batch progress (rows, durations, state size) in memory.

Operational necessity at scale — throughput regressions, watermark
stalls, and state-store growth show up in progress events long before
they show up as an incident. The listener is the push-based analogue
of ``df.observe`` (sources/io tests) for the streaming side;
production would forward events to a metrics sink, here they land in
a bounded in-memory list the tests (and notebooks) can assert on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    batch_duration_ms: int | None
    state_rows: int | None


@dataclass
class ProgressRecorder:
    """Bounded progress buffer (keeps the most recent ``cap``
    batches — a listener must never grow without bound)."""

    cap: int = 1000
    events: list[BatchProgress] = field(default_factory=list)

    def add(self, p: BatchProgress) -> None:
        self.events.append(p)
        if len(self.events) > self.cap:
            del self.events[: len(self.events) - self.cap]

    def total_rows(self) -> int:
        return sum(e.num_input_rows for e in self.events)


class _Listener(StreamingQueryListener):
    def __init__(self, recorder: ProgressRecorder) -> None:
        self._rec = recorder

    def onQueryStarted(self, event) -> None:  # noqa: N802 -- Spark API
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = p.stateOperators
        self._rec.add(
            BatchProgress(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                batch_duration_ms=(p.durationMs or {}).get("triggerExecution"),
                state_rows=state[0].numRowsTotal if state else None,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_listener(
    spark: SparkSession, cap: int = 1000
) -> tuple[ProgressRecorder, StreamingQueryListener]:
    """Register a progress listener; returns (recorder, listener) —
    detach with ``spark.streams.removeListener(listener)``."""
    rec = ProgressRecorder(cap=cap)
    listener = _Listener(rec)
    spark.streams.addListener(listener)
    return rec, listener
