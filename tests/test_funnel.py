"""Funnel + retention: hand-computable event sequences, ordering semantics,
span bound, single-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

from fdp_dynamically_controlled_streams_spark.operators.funnel import (
    funnel_counts,
    funnel_steps,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _t(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_funnel_requires_step_order(spark):
    rows = [
        (1, _t(1), "a"), (1, _t(2), "b"),          # in order: completes both
        (2, _t(2), "b"), (2, _t(3), "a"),          # b before a: only step 1
        (3, _t(5), "b"),                           # never did a: excluded
    ]
    got = {
        r.user_id: (r.step1_ts, r.step2_ts)
        for r in funnel_steps(_ev(spark, rows), "user_id", "ts", "event_type", ["a", "b"]).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (_t(1), _t(2))
    assert got[2] == (_t(3), None)


def test_funnel_same_timestamp_counts_in_order(spark):
    rows = [(1, _t(1), "a"), (1, _t(1), "b")]
    got = funnel_steps(_ev(spark, rows), "user_id", "ts", "event_type", ["a", "b"]).collect()
    assert got[0].step2_ts == _t(1)  # ties are inclusive (ts >= prev)


def test_funnel_max_span_anchored_at_step1(spark):
    rows = [
        (1, _t(1), "a"), (1, _t(3), "b"), (1, _t(9), "c"),   # c past 7d? no: day 9 - day 1 = 8d > 7d
        (2, _t(1), "a"), (2, _t(3), "b"), (2, _t(8), "c"),   # exactly 7d: inclusive
    ]
    got = {
        r.user_id: r.step3_ts
        for r in funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type", ["a", "b", "c"], max_span="7 days"
        ).collect()
    }
    assert got[1] is None
    assert got[2] == _t(8)


def test_funnel_counts_and_conversion(spark):
    rows = [
        (1, _t(1), "a"), (1, _t(2), "b"),
        (2, _t(1), "a"), (2, _t(2), "b"),
        (3, _t(1), "a"),
        (4, _t(1), "x"),
    ]
    got = {
        r.step: (r.step_name, r.users_reached, r.conversion)
        for r in funnel_counts(_ev(spark, rows), "user_id", "ts", "event_type", ["a", "b"]).collect()
    }
    assert got[1] == ("a", 3, 1.0)
    assert got[2] == ("b", 2, round(2 / 3, 6))


def test_funnel_single_shuffle_plan(spark):
    rows = [(1, _t(1), "a"), (1, _t(2), "b"), (1, _t(3), "c")]
    plan = (
        funnel_steps(_ev(spark, rows), "user_id", "ts", "event_type", ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_triangle(spark):
    rows = [
        (1, _t(1), "e"), (1, _t(2), "e"), (1, _t(2, 5), "e"),  # day0+day1
        (2, _t(1), "e"),                                        # day0 only
        (3, _t(2), "e"), (3, _t(4), "e"),                       # cohort day2, offset 2
    ]
    got = {
        (str(r.cohort), r.offset): (r.n_users, r.retention)
        for r in retention_cohorts(_ev(spark, rows), "user_id", "ts", unit="day").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-02", 0)] == (1, 1.0)
    assert got[("2024-01-02", 2)] == (1, 1.0)
    assert len(got) == 4


def test_retention_month_unit_calendar_months(spark):
    rows = [(1, datetime(2024, 1, 30), "e"), (1, datetime(2024, 2, 1), "e")]
    got = {
        r.offset for r in retention_cohorts(_ev(spark, rows), "user_id", "ts", unit="month").collect()
    }
    assert got == {0, 1}  # Jan 30 → Feb 1 is one calendar month apart
