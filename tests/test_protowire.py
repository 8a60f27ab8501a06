"""P1/P4-P6 surface: protobuf wire codec + the full bytes-in/bytes-out
controller pipeline, including malformed-input handling (FIXTURES.md F4)."""

from __future__ import annotations

import struct

from fdp_dynamically_controlled_streams_spark.functions import protowire as pw
from fdp_dynamically_controlled_streams_spark.operators.controller import (
    controller_from_bytes,
)


def test_roundtrip_sensor():
    b = pw.encode_sensor_data(12345, 42.5)
    # known-good wire bytes: field1 varint 12345, field2 little-endian double
    assert b == b"\x08\xb9\x60" + b"\x11" + struct.pack("<d", 42.5)
    assert pw.decode_sensor_data(b) == (12345, 42.5)


def test_roundtrip_control():
    b = pw.encode_temperature_control(7, 45.0, 1.0, 2.0)
    assert pw.decode_temperature_control(b) == (7, 45.0, 1.0, 2.0)


def test_heater_control_proto3_default_elision():
    assert pw.encode_heater_control(5, 0) == b"\x08\x05"  # On(0) omitted
    assert pw.encode_heater_control(5, 1) == b"\x08\x05\x10\x01"


def test_unknown_fields_skipped():
    extra = pw.encode_sensor_data(1, 2.0) + b"\x2a\x03abc"  # field 5, bytes
    assert pw.decode_sensor_data(extra) == (1, 2.0)


def test_malformed_returns_none():
    for bad in (b"\x08", b"\x11\x00", b"\xff\xff\xff", b"\x08\x80"):
        assert pw.decode_sensor_data(bad) is None
        assert pw.decode_temperature_control(bad) is None


def test_bytes_pipeline_end_to_end(spark):
    """Encode a scenario to wire bytes, run decode -> controller -> encode;
    corrupt records must be dropped silently (F4), output bytes must decode."""
    control_rows = [
        (pw.encode_temperature_control(1, 45.0, 1.0, 1.0), 0),
        (b"\xff\xfe\xfd", 1),  # corrupt control
    ]
    sensor_rows = [
        (pw.encode_sensor_data(1, 50.0), 2),  # -> Off(1)
        (b"\x08", 3),  # truncated sensor record
        (pw.encode_sensor_data(1, 40.0), 4),  # -> On(0)
    ]
    control = spark.createDataFrame(control_rows, "value binary, seq long")
    sensor = spark.createDataFrame(sensor_rows, "value binary, seq long")
    out = controller_from_bytes(control, sensor).orderBy("seq").collect()
    assert [(r.sensor_id, r.command, r.seq) for r in out] == [(1, 1, 2), (1, 0, 4)]
    # output payloads are valid HeaterControl wire bytes
    decoded = [pw._walk_fields(bytes(r.value)) for r in out]
    assert [dict((f, v) for f, _, v in d) for d in decoded] == [
        {1: 1, 2: 1},
        {1: 1},  # command=0 elided (proto3 default)
    ]


def test_heater_control_roundtrip():
    from fdp_dynamically_controlled_streams_spark.functions.protowire import (
        decode_heater_control,
        encode_heater_control,
    )

    for sid, cmd in [(0, 0), (7, 1), (123, 0)]:
        assert decode_heater_control(encode_heater_control(sid, cmd)) == (sid, cmd)
    assert decode_heater_control(b"\xff\xff") is None
