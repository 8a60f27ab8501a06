"""Streaming controller on the Spark 4 ``transformWithState`` runtime — the
same ``controlTemperature`` semantics (SparkStructuredController.scala:96-118)
as streaming/controller.py, expressed as a ``StatefulProcessor``.

Why a second streaming runtime: ``transformWithStateInPandas`` (4.0+) is the
successor to ``applyInPandasWithState`` — composable typed state (value/list/
map), timers, TTL, and initial-state bootstrap. The engine ships both with one
shared spec so the oracle gates them identically; new deployments should pick
this one, and the golden/property suites hold for either.

State here is a single ValueState carrying the
``TemperatureControlWithLastValue`` shape (DataModelTransform.scala:39); the
per-batch group ordering rule (seq, control-first) is identical to the
applyInPandasWithState form.

Runtime requirement: Spark's transformWithState Python state-server protocol
is protobuf-based — the ``protobuf`` package must be importable in the Python
workers (``TWS_AVAILABLE`` below; the test suite skips, not fails, without
it). The applyInPandasWithState runtime has no such dependency and remains
the default.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from fdp_dynamically_controlled_streams_spark.streaming.controller import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
)


def _tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = _tws_available()


class ControllerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("controller_state", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        sensor_id = int(key[0])
        if self._state.exists():
            last_action, desired, up_delta, down_delta = self._state.get()
            has_setting = desired is not None
        else:
            last_action, desired, up_delta, down_delta = -1, None, None, None
            has_setting = False

        out: list[tuple[int, int, int]] = []
        for pdf in rows:
            pdf = pdf.sort_values(["seq", "record_kind"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                if row.record_kind == 0:  # control
                    desired, up_delta, down_delta = (
                        row.desired,
                        row.up_delta,
                        row.down_delta,
                    )
                    has_setting = True
                elif has_setting:
                    t = row.temperature
                    action = (
                        1
                        if t > desired + up_delta
                        else (0 if t < desired - down_delta else -1)
                    )
                    if action >= 0 and action != last_action:
                        out.append((sensor_id, action, int(row.seq)))
                        last_action = action

        if has_setting:
            self._state.update(
                (int(last_action), float(desired), float(up_delta), float(down_delta))
            )
        if out:
            yield pd.DataFrame(out, columns=["sensor_id", "command", "seq"])

    def close(self) -> None:
        pass


def controller_streaming_tws(unified: DataFrame) -> DataFrame:
    """transformWithStateInPandas form of the controller over the tagged-
    union stream (same input/output contract as controller_streaming)."""
    from pyspark.sql import functions as F

    filtered = unified.where(F.col("sensor_id") >= 0)  # P4
    return filtered.groupBy("sensor_id").transformWithStateInPandas(
        ControllerProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
