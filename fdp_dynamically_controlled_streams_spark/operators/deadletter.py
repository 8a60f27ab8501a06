"""Bad-record handling with a dead-letter branch — the P6 operator
(flinkcontroller/.../BadDataHandler.scala:13-19: emit on Success, log-and-drop
on Failure) upgraded from log-and-drop to capture-and-continue.

The reference's three bad-record forms (SURVEY §2.2 P4-P6) all *discard*
failures. At pipeline scale discarding silently loses data quality signal, so
the engine's form splits instead: good rows flow on, failed rows land in an
append-only parquet dead-letter location with the batch id that saw them —
replayable after a codec fix.

Batch: two filtered views of one plan (Catalyst pushes each predicate to the
scan; cache upstream if the source is expensive and both branches are
consumed). Streaming: a ``foreachBatch`` splitter — the micro-batch is
persisted once, both branches read the cached batch, so the split adds no
second source scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_records(df: DataFrame, ok: Column) -> tuple[DataFrame, DataFrame]:
    """(good, dead): rows where ``ok`` holds vs. rows where it is false or
    null. The two results partition the input exactly."""
    return df.where(ok), df.where(~ok.eqNullSafe(True))


def dead_letter_batch_writer(
    process_good: Callable[[DataFrame, int], None],
    ok: Column,
    dead_path: str,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that routes each micro-batch through
    the good path and appends failures (stamped with the batch id) to the
    parquet dead-letter location."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            good, dead = split_records(batch, ok)
            process_good(good, batch_id)
            (
                dead.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(dead_path)
            )
        finally:
            batch.unpersist()

    return handle
