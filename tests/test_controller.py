"""Controller semantics tests: the FIXTURES.md F5 golden closed-loop scenario
and the F6 interleave property matrix, against the reference spec
(SparkStructuredController.scala:96-118)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.controller import (
    controller_batch,
)
from fdp_dynamically_controlled_streams_spark.schemas import HEATER_OFF, HEATER_ON


def _dfs(spark, control_rows, sensor_rows):
    control = spark.createDataFrame(
        control_rows, "sensor_id int, desired double, up_delta double, down_delta double, seq long"
    )
    sensor = spark.createDataFrame(
        sensor_rows, "sensor_id int, temperature double, seq long"
    )
    return control, sensor


def _run(spark, control_rows, sensor_rows):
    control, sensor = _dfs(spark, control_rows, sensor_rows)
    out = controller_batch(control, sensor).orderBy("seq").collect()
    return [(r.sensor_id, r.command) for r in out]


def simulate_heater(n_ticks: int = 200):
    """F5 golden scenario: demo constants (Heater.scala:18-26,49-57) —
    start 42.0, desired 45.0, deltas 1.0, up 1 min, down 2 min, tick 10 s,
    initial heater state Off. Control arrives as the first record."""
    temp, op = 42.0, HEATER_OFF  # heaterOperation = 1 (Off) initially
    desired, delta = 45.0, 1.0
    control_rows = [(1, desired, delta, delta, 0)]
    sensor_rows, expected = [], []
    last_action = -1
    seq = 1
    for _ in range(n_ticks):
        # physics tick then publish (Heater.scala:49-66)
        temp = temp + 10.0 / 60.0 if op == HEATER_ON else temp - 10.0 / 120.0
        sensor_rows.append((1, temp, seq))
        # reference controller spec
        action = 1 if temp > desired + delta else (0 if temp < desired - delta else -1)
        if action >= 0 and action != last_action:
            expected.append((1, action))
            last_action = action
            op = action  # feedback loop: heater obeys the command (H4)
        seq += 1
    return control_rows, sensor_rows, expected


def test_golden_closed_loop(spark):
    control_rows, sensor_rows, expected = simulate_heater()
    got = _run(spark, control_rows, sensor_rows)
    assert got == expected
    # sanity: the loop oscillates => both commands appear, multiple switches
    commands = [c for _, c in got]
    assert HEATER_ON in commands and HEATER_OFF in commands
    assert len(got) >= 3


def test_no_output_before_first_control(spark):
    # F6: data-before-control — no emission until a control record exists
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 10)],
        [(1, 50.0, 1), (1, 50.0, 2), (1, 50.0, 11)],
    )
    assert got == [(1, 1)]  # only the post-control reading emits


def test_latest_control_wins(spark):
    # F6: multiple controls between readings — latest setting applies
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 0), (1, 100.0, 1.0, 1.0, 1)],
        [(1, 50.0, 2)],
    )
    assert got == [(1, 0)]  # 50 < 100-1 => On, not Off


def test_emit_on_change_suppression(spark):
    # F6: duplicate consecutive actions suppressed; in-band emits nothing
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 0)],
        [(1, 50.0, 1), (1, 51.0, 2), (1, 45.0, 3), (1, 40.0, 4), (1, 39.0, 5), (1, 50.0, 6)],
    )
    assert got == [(1, 1), (1, 0), (1, 1)]


def test_key_isolation(spark):
    # F6: multiple keys interleaved — state is per-key
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 0), (2, 45.0, 1.0, 1.0, 1)],
        [(1, 50.0, 2), (2, 40.0, 3), (1, 50.0, 4), (2, 40.0, 5)],
    )
    assert sorted(got) == [(1, 1), (2, 0)]


def test_bad_record_sentinel_filtered(spark):
    # P4: sensor_id = -1 (parse-failure sentinel) never reaches the operator
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 0), (-1, 0.0, 0.0, 0.0, 1)],
        [(-1, 99.0, 2), (1, 50.0, 3)],
    )
    assert got == [(1, 1)]


def test_control_before_data_on_tie(spark):
    # Union-order rule (SparkStructuredController.scala:69-70): control at the
    # same seq applies before the data record.
    got = _run(
        spark,
        [(1, 45.0, 1.0, 1.0, 5)],
        [(1, 50.0, 5)],
    )
    assert got == [(1, 1)]


def test_ties_property_never_consecutive_equal(spark):
    # Property (SURVEY §5.2-i): never two consecutive equal commands per key
    import random

    rng = random.Random(42)
    control_rows = [(k, 50.0, 2.0, 2.0, 0) for k in range(3)]
    sensor_rows = [
        (rng.randrange(3), rng.uniform(30.0, 70.0), i + 1) for i in range(300)
    ]
    control, sensor = _dfs(spark, control_rows, sensor_rows)
    out = controller_batch(control, sensor).orderBy("sensor_id", "seq").collect()
    by_key: dict[int, list[int]] = {}
    for r in out:
        by_key.setdefault(r.sensor_id, []).append(r.command)
    for cmds in by_key.values():
        assert all(a != b for a, b in zip(cmds, cmds[1:]))
