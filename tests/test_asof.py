"""As-of join direction laws on a hand-checkable scenario."""

from __future__ import annotations

import datetime as dt

from fdp_dynamically_controlled_streams_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)


def _frames(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(30), "b"), (2, t(5), "c"), (3, t(7), "d")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(20), 200.0), (2, t(50), 500.0)],
        "k int, ts timestamp, price double",
    )
    return left, right


def test_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.price
        for r in asof_join(left, right, "k", "ts", "ts", ["price"]).collect()
    }
    # simultaneous right (t=10) matches; later left picks the newest prior;
    # key 2's only right is in the future -> null; key 3 has no rights
    assert out == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_forward_picks_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.price
        for r in asof_join_forward(
            left, right, "k", "ts", "ts", ["price"]
        ).collect()
    }
    # simultaneous right still matches forward; t=30 has nothing after;
    # key 2 sees its future right
    assert out == {"a": 100.0, "b": None, "c": 500.0, "d": None}


def test_right_time_ties_resolve_by_tiebreak(spark):
    # round-10 regression (found by the full-catalog sf0.1 tier): two right
    # rows sharing (key, time) left the winner to partition-local sort
    # order. With tiebreak=payload, backward picks the tie-group MAX and
    # forward the tie-group MIN — deterministic under any partitioning.
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(30), "after"), (1, t(5), "before")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(10), 300.0), (1, t(10), 100.0), (1, t(10), 200.0)],
        "k int, ts timestamp, price double",
    )
    for reps in (1, 7):
        r = right.repartition(reps)
        back = {
            x.tag: x.price
            for x in asof_join(
                left, r, "k", "ts", "ts", ["price"], tiebreak=["price"]
            ).collect()
        }
        fwd = {
            x.tag: x.price
            for x in asof_join_forward(
                left, r, "k", "ts", "ts", ["price"], tiebreak=["price"]
            ).collect()
        }
        assert back == {"after": 300.0, "before": None}, reps
        assert fwd == {"after": None, "before": 100.0}, reps


def test_directions_preserve_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, "k", "ts", "ts", ["price"]).count() == 4
    assert (
        asof_join_forward(left, right, "k", "ts", "ts", ["price"]).count() == 4
    )
