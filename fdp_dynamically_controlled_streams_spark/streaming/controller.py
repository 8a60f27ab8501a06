"""Streaming controller: the reference's ``controlTemperature`` state machine
(SparkStructuredController.scala:96-118) as an ``applyInPandasWithState``
processor over the tagged-union stream.

Semantics (the spec, shared with operators/controller.py):
  control record -> state.setting := control, lastAction carried (:100-103)
  sensor record  -> if setting exists: hysteresis action; emit iff action>=0
                    and action != lastAction; then lastAction := action (:104-114)

Engine rules on top of the reference:
  * intra-batch ordering is explicit — each micro-batch group is sorted by
    (seq, record_kind) with control first on ties (the reference leans on
    undefined union order, SparkStructuredController.scala:69-70 / SURVEY §4.2)
  * state is the managed GroupState (checkpointed) — never a per-task local
    map (the Flink/Kafka-Streams dedup-loss bug, SURVEY §2.4 G3/G4)

Scale: state is per-key (sensor_id), partitioned by the groupBy hash shuffle;
with RocksDB state store (session.ENGINE_CONF) key spaces beyond executor
memory are fine. Arrow batches cross the JVM->Python boundary once per
micro-batch per partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: Output rows: the emitted HeaterControl commands.
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.IntegerType()),
        T.StructField("command", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)

#: Keyed state: (last_action, desired, up_delta, down_delta) — the
#: TemperatureControlWithLastValue carrier (DataModelTransform.scala:39).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_action", T.IntegerType()),
        T.StructField("desired", T.DoubleType()),
        T.StructField("up_delta", T.DoubleType()),
        T.StructField("down_delta", T.DoubleType()),
    ]
)


def _control_temperature(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key micro-batch handler — a faithful translation of the spec above
    to pandas (the loop runs over one key's records, already tiny)."""
    sensor_id = int(key[0])
    if state.exists:
        last_action, desired, up_delta, down_delta = state.get
        has_setting = desired is not None
    else:
        last_action, desired, up_delta, down_delta = -1, None, None, None
        has_setting = False

    out_sensor: list[int] = []
    out_command: list[int] = []
    out_seq: list[int] = []

    for pdf in pdf_iter:
        # Engine ordering rule: control (record_kind 0) before data on seq ties.
        pdf = pdf.sort_values(["seq", "record_kind"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            if row.record_kind == 0:  # control
                desired, up_delta, down_delta = row.desired, row.up_delta, row.down_delta
                has_setting = True
            else:  # sensor
                if not has_setting:
                    continue
                t = row.temperature
                action = 1 if t > desired + up_delta else (0 if t < desired - down_delta else -1)
                if action >= 0 and action != last_action:
                    out_sensor.append(sensor_id)
                    out_command.append(action)
                    out_seq.append(int(row.seq))
                    last_action = action

    if has_setting:
        state.update((int(last_action), float(desired), float(up_delta), float(down_delta)))
    if out_sensor:
        yield pd.DataFrame(
            {"sensor_id": out_sensor, "command": out_command, "seq": out_seq}
        )


def controller_streaming(unified: DataFrame) -> DataFrame:
    """Apply the stateful controller to a (streaming or batch) tagged-union
    DataFrame with columns (sensor_id, record_kind, temperature, desired,
    up_delta, down_delta, seq) — see operators.controller.unify_streams.

    Returns the emitted command stream (sensor_id, command, seq); use
    ``outputMode("update")`` + a 1 s processing-time trigger for reference
    cadence parity (O1/O2, SparkStructuredController.scala:81,85).
    """
    from pyspark.sql import functions as F

    filtered = unified.where(F.col("sensor_id") >= 0)  # P4 bad-record filter
    return filtered.groupBy("sensor_id").applyInPandasWithState(
        _control_temperature,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
