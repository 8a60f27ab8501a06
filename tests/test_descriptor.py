"""FileDescriptorSet artifact: byte-stable, structurally valid, and (where
the spark-protobuf JAR exists) equivalent to the pandas wire codec."""

from __future__ import annotations

import pytest

from fdp_dynamically_controlled_streams_spark.functions.descriptor import (
    build_descriptor_set,
    descriptor_path,
)
from fdp_dynamically_controlled_streams_spark.functions.protowire import (
    _walk_fields,
    decode_sensor_jvm,
    encode_sensor_data,
)


def test_checked_in_artifact_matches_builder():
    with open(descriptor_path(), "rb") as fh:
        assert fh.read() == build_descriptor_set()


def test_descriptor_structure():
    """Parse the generated FileDescriptorSet with the engine's own wire
    walker: one file, three messages with the reference's exact field
    numbers/types (messages.proto:6-29), one enum."""
    fds = list(_walk_fields(build_descriptor_set()))
    assert [f for f, _, _ in fds] == [1]  # one FileDescriptorProto
    file_fields = list(_walk_fields(fds[0][2]))
    assert (1, 2, b"messages.proto") in file_fields
    assert (12, 2, b"proto3") in file_fields

    def fields_of(msg: bytes):
        out = {}
        for f, _, v in _walk_fields(msg):
            if f == 2:  # FieldDescriptorProto
                d = {f2: v2 for f2, _, v2 in _walk_fields(v)}
                out[d[1].decode()] = (d[3], d[5])  # name -> (number, type)
        return out

    msgs = {
        next(v for f, _, v in _walk_fields(m) if f == 1).decode(): fields_of(m)
        for f, _, m in file_fields
        if f == 4
    }
    T_DOUBLE, T_INT32, T_ENUM = 1, 5, 14
    assert msgs["SensorData"] == {
        "sensorID": (1, T_INT32),
        "temperature": (2, T_DOUBLE),
    }
    assert msgs["TemperatureControl"] == {
        "sensorID": (1, T_INT32),
        "desired": (2, T_DOUBLE),
        "upDelta": (3, T_DOUBLE),
        "downDelta": (4, T_DOUBLE),
    }
    assert msgs["HeaterControl"] == {
        "sensorID": (1, T_INT32),
        "command": (2, T_ENUM),
    }
    enums = [m for f, _, m in file_fields if f == 5]
    assert len(enums) == 1
    enum_values = {
        next(v2 for f2, _, v2 in _walk_fields(v) if f2 == 1).decode(): next(
            (v2 for f2, _, v2 in _walk_fields(v) if f2 == 2), 0
        )
        for f, _, v in _walk_fields(enums[0])
        if f == 2
    }
    assert enum_values == {"On": 0, "Off": 1}


def test_jvm_decode_tier_or_gated_skip(spark):
    """When spark-protobuf is on the classpath the JVM tier must decode the
    wire bytes identically to the pandas codec (including the -1 malformed
    sentinel) with zero Python evals in the plan; otherwise it must cleanly
    report unavailable so callers fall back."""
    payloads = [
        (encode_sensor_data(7, 21.5), 1),
        (b"\xff\xff\xff", 2),  # malformed -> sentinel -1
    ]
    df = spark.createDataFrame(payloads, "value binary, seq long")
    decoded = decode_sensor_jvm(df)
    if decoded is None:
        pytest.skip(
            "spark-protobuf JAR not on classpath; pandas codec tier covers P1"
        )
    rows = {r.seq: (r.sensor_id, r.temperature) for r in decoded.collect()}
    assert rows == {1: (7, 21.5), 2: (-1, 0.0)}
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
