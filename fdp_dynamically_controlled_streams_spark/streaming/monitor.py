"""Streaming diagnostics — the O7 surface (SURVEY §2.5).

The reference observes its pipelines with per-record ``println`` traces
(SparkStructuredController.scala:101,110 et al.). The engine's form is a
``StreamingQueryListener``: structured per-batch progress (rows/sec, batch
duration, state rows, watermark) — off the data path, no per-record cost,
and queryable after the run.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchStats:
    batch_id: int
    num_input_rows: int
    process_ms: float | None
    state_rows: int | None
    watermark: str | None


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Collects one BatchStats per completed micro-batch (all queries on the
    session while attached). Attach with ``spark.streams.addListener``;
    detach with ``removeListener``."""

    batches: list[BatchStats] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = None
        if p.stateOperators:
            state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        self.batches.append(
            BatchStats(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                process_ms=(p.durationMs or {}).get("triggerExecution"),
                state_rows=state_rows,
                watermark=(p.eventTime or {}).get("watermark"),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
