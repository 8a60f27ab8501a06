"""Boundary semantics of the feature-store point-in-time composition
(queries.py::cdc_point_in_time_snapshots builds on these exact rules):
a probe AT a change timestamp must see the NEW value (as-of = latest
state with valid_from <= probe), probes before the first change carry
NULL, and the hourly probe grid spans floor(min ts) .. max ts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators import asof as asof_ops
from fdp_dynamically_controlled_streams_spark.operators import merge as merge_ops


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_pit_probe_at_change_instant_sees_new_state(spark):
    ev = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:30:00"), 1),
            (1, "b", _ts("2024-01-01 12:00:00"), 2),  # change exactly on an hour
            (1, "b", _ts("2024-01-01 13:15:00"), 3),  # no change -> suppressed
            (1, "c", _ts("2024-01-01 14:45:00"), 4),
        ],
        ["user_id", "event_type", "ts", "event_id"],
    )
    hist = merge_ops.scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tie_break=["event_id"]
    ).select("user_id", F.col("valid_from").alias("vf"), "event_type")
    probes = spark.createDataFrame(
        [(1, _ts(p)) for p in (
            "2024-01-01 10:00:00",  # before first change -> NULL
            "2024-01-01 11:00:00",  # after 'a'
            "2024-01-01 12:00:00",  # AT the 'b' change instant -> 'b'
            "2024-01-01 14:00:00",  # between suppressed dup and 'c'
            "2024-01-01 15:00:00",  # after 'c'
        )],
        ["user_id", "snap"],
    )
    out = asof_ops.asof_join(
        probes, hist, on="user_id", left_time="snap", right_time="vf",
        payload=["event_type"],
    )
    got = {r.snap.strftime("%H:%M"): r.event_type for r in out.collect()}
    assert got == {
        "10:00": None,
        "11:00": "a",
        "12:00": "b",
        "14:00": "b",
        "15:00": "c",
    }


def test_pit_entry_grid_spans_user_range(spark):
    from fdp_dynamically_controlled_streams_spark.queries import spark_queries

    out = spark_queries()["cdc_point_in_time_snapshots"](
        spark, "/root/testdata/sf0.001"
    )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    one = ev.groupBy("user_id").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy(F.desc("n")).first()
    rows = out.where(F.col("user_id") == one.user_id).collect()
    lo = one.mn.replace(minute=0, second=0, microsecond=0)
    expected = int((one.mx - lo).total_seconds() // 3600) + 1
    assert len(rows) == expected
    # grid is hourly and starts at the floored first-seen hour
    snaps = sorted(r.snapshot_ts for r in rows)
    assert snaps[0] == lo.strftime("%Y-%m-%d %H:%M:%S")
    # no snapshot after the first change is NULL (state persists)
    non_null_started = False
    for r in sorted(rows, key=lambda r: r.snapshot_ts):
        if r.state_event_type is not None:
            non_null_started = True
        elif non_null_started:
            raise AssertionError("state reverted to NULL after first change")
