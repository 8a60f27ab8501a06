"""Protobuf wire-format codec for the reference's message schema
(protobufs/src/main/protobuf/messages.proto) — the P1 deserialization surface
(SparkStructuredController.scala:38-39, DataModelTransform.scala:11-25).

Messages (proto3, primitive fields only):
  SensorData         { int32 sensorID = 1; double temperature = 2; }
  TemperatureControl { int32 sensorID = 1; double desired = 2;
                       double upDelta = 3; double downDelta = 4; }
  HeaterControl      { int32 sensorID = 1; HeaterCommand command = 2; }  # enum varint

Two tiers, same semantics:
  * On clusters with the protobuf package available, prefer Spark's built-in
    ``pyspark.sql.protobuf.functions.from_protobuf/to_protobuf`` (JVM-side,
    codegen, prunable) — see ``from_protobuf_or_none``.
  * This module is the dependency-free path: a hand-rolled varint/fixed64
    parser for exactly these three shapes, exposed as Arrow-vectorized pandas
    UDFs. Malformed bytes decode to None -> the caller maps to the sentinel
    ``sensor_id = -1`` and filters (P4-P6; DataModelTransform.scala:11,
    BadDataHandler.scala:13-19).

Parsing is generic over fields (tag-walk, unknown fields skipped) so
out-of-order / extra fields — legal protobuf — decode correctly.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated varint")
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7


def _walk_fields(buf: bytes) -> Iterator[tuple[int, int, int | float | bytes]]:
    """Yield (field_no, wire_type, value) triples; raise on malformed input."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 0x7
        if wire_type == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire_type == 1:  # fixed64
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64")
            val = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire_type == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated bytes field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wire_type == 5:  # fixed32
            if pos + 4 > len(buf):
                raise ValueError("truncated fixed32")
            val = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        yield field_no, wire_type, val


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_sensor_data(sensor_id: int, temperature: float) -> bytes:
    return (
        b"\x08" + _encode_varint(sensor_id) + b"\x11" + struct.pack("<d", temperature)
    )


def encode_temperature_control(
    sensor_id: int, desired: float, up_delta: float, down_delta: float
) -> bytes:
    return (
        b"\x08"
        + _encode_varint(sensor_id)
        + b"\x11"
        + struct.pack("<d", desired)
        + b"\x19"
        + struct.pack("<d", up_delta)
        + b"\x21"
        + struct.pack("<d", down_delta)
    )


def encode_heater_control(sensor_id: int, command: int) -> bytes:
    # proto3 default-value elision: command=0 (On) is omitted on the wire.
    out = b"\x08" + _encode_varint(sensor_id)
    if command:
        out += b"\x10" + _encode_varint(command)
    return out


def decode_sensor_data(buf: bytes) -> tuple[int, float] | None:
    try:
        sensor_id, temperature = 0, 0.0
        for field_no, wt, val in _walk_fields(buf):
            if field_no == 1 and wt == 0:
                sensor_id = int(val)
            elif field_no == 2 and wt == 1:
                temperature = float(val)
        return sensor_id, temperature
    except (ValueError, struct.error):
        return None


def decode_temperature_control(buf: bytes) -> tuple[int, float, float, float] | None:
    try:
        vals: dict[int, float] = {}
        sensor_id = 0
        for field_no, wt, val in _walk_fields(buf):
            if field_no == 1 and wt == 0:
                sensor_id = int(val)
            elif field_no in (2, 3, 4) and wt == 1:
                vals[field_no] = float(val)
        return sensor_id, vals.get(2, 0.0), vals.get(3, 0.0), vals.get(4, 0.0)
    except (ValueError, struct.error):
        return None


def decode_heater_control(buf: bytes) -> tuple[int, int] | None:
    """HeaterControl {sensorID=1, command=2 enum varint} — the K1 payload
    read-back used by the Kafka integration test."""
    try:
        sensor_id, command = 0, 0
        for field_no, wt, val in _walk_fields(buf):
            if field_no == 1 and wt == 0:
                sensor_id = int(val)
            elif field_no == 2 and wt == 0:
                command = int(val)
        return sensor_id, command
    except (ValueError, struct.error):
        return None


SENSOR_STRUCT = T.StructType(
    [
        T.StructField("sensor_id", T.IntegerType()),
        T.StructField("temperature", T.DoubleType()),
    ]
)

CONTROL_STRUCT = T.StructType(
    [
        T.StructField("sensor_id", T.IntegerType()),
        T.StructField("desired", T.DoubleType()),
        T.StructField("up_delta", T.DoubleType()),
        T.StructField("down_delta", T.DoubleType()),
    ]
)


@F.pandas_udf(SENSOR_STRUCT)
def decode_sensor_udf(value: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized SensorData decode; malformed -> sentinel sensor_id=-1
    (DataModelTransform.scala:11 failedModel), filterable via P4."""
    decoded = [decode_sensor_data(b) if b is not None else None for b in value]
    return pd.DataFrame(
        {
            "sensor_id": [d[0] if d else -1 for d in decoded],
            "temperature": [d[1] if d else None for d in decoded],
        }
    )


@F.pandas_udf(CONTROL_STRUCT)
def decode_control_udf(value: pd.Series) -> pd.DataFrame:
    decoded = [decode_temperature_control(b) if b is not None else None for b in value]
    return pd.DataFrame(
        {
            "sensor_id": [d[0] if d else -1 for d in decoded],
            "desired": [d[1] if d else None for d in decoded],
            "up_delta": [d[2] if d else None for d in decoded],
            "down_delta": [d[3] if d else None for d in decoded],
        }
    )


@F.pandas_udf(T.BinaryType())
def encode_sensor_data_udf(sensor_id: pd.Series, temperature: pd.Series) -> pd.Series:
    return pd.Series(
        [encode_sensor_data(int(s), float(t)) for s, t in zip(sensor_id, temperature)]
    )


@F.pandas_udf(T.BinaryType())
def encode_temperature_control_udf(
    sensor_id: pd.Series, desired: pd.Series, up_delta: pd.Series, down_delta: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            encode_temperature_control(int(s), float(d), float(u), float(dn))
            for s, d, u, dn in zip(sensor_id, desired, up_delta, down_delta)
        ]
    )


@F.pandas_udf(T.BinaryType())
def encode_heater_control_udf(sensor_id: pd.Series, command: pd.Series) -> pd.Series:
    """HeaterControl serialize step (K1; DataModelTransform.scala:34-36)."""
    return pd.Series(
        [encode_heater_control(int(s), int(c)) for s, c in zip(sensor_id, command)]
    )


def from_protobuf_or_none(
    col: Column,
    message_name: str,
    desc_path: str | None = None,
    options: dict | None = None,
):
    """JVM-side decode via Spark's protobuf connector when present (preferred
    at scale: stays in codegen, supports pruning). Returns None when the
    spark-protobuf package is not on the classpath. ``desc_path`` defaults to
    the checked-in FileDescriptorSet for messages.proto
    (functions/descriptor.py, built offline without protoc)."""
    if desc_path is None:
        from fdp_dynamically_controlled_streams_spark.functions.descriptor import (
            descriptor_path,
        )

        desc_path = descriptor_path()
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        return from_protobuf(
            col, message_name, descFilePath=desc_path, options=options or {}
        )
    except Exception:  # noqa: BLE001 — connector absent
        return None


def decode_sensor_jvm(df, seq_col: str = "seq"):
    """JVM-tier SensorData decode: ``from_protobuf`` in PERMISSIVE mode (a
    malformed record decodes to a NULL struct, mapped to the same sentinel
    ``sensor_id = -1`` the pandas tier uses, so P4-P6 semantics are
    identical). Returns None when the spark-protobuf JAR is absent — callers
    fall back to the Arrow-pandas codec. The decode is a codegen'd
    expression: zero Python evals on the path (plan-asserted in
    tests/test_descriptor.py where the JAR exists)."""
    col = from_protobuf_or_none(
        F.col("value"), "SensorData", options={"mode": "PERMISSIVE"}
    )
    if col is None:
        return None
    try:
        out = df.select(col.alias("d"), seq_col).select(
            F.coalesce(F.col("d.sensorID"), F.lit(-1)).alias("sensor_id"),
            F.coalesce(F.col("d.temperature"), F.lit(0.0)).alias("temperature"),
            seq_col,
        )
        out.schema  # force analysis: PROTOBUF_NOT_LOADED surfaces here
        return out
    except Exception:  # noqa: BLE001 — connector absent at analysis time
        return None


def decode_control_jvm(df, seq_col: str = "seq"):
    """JVM-tier TemperatureControl decode (see decode_sensor_jvm)."""
    col = from_protobuf_or_none(
        F.col("value"), "TemperatureControl", options={"mode": "PERMISSIVE"}
    )
    if col is None:
        return None
    try:
        out = df.select(col.alias("d"), seq_col).select(
            F.coalesce(F.col("d.sensorID"), F.lit(-1)).alias("sensor_id"),
            F.coalesce(F.col("d.desired"), F.lit(0.0)).alias("desired"),
            F.coalesce(F.col("d.upDelta"), F.lit(0.0)).alias("up_delta"),
            F.coalesce(F.col("d.downDelta"), F.lit(0.0)).alias("down_delta"),
            seq_col,
        )
        out.schema  # force analysis: PROTOBUF_NOT_LOADED surfaces here
        return out
    except Exception:  # noqa: BLE001 — connector absent at analysis time
        return None
