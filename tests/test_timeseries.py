"""Resample + forward-fill: crafted gaps, per-key ranges, determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from fdp_dynamically_controlled_streams_spark.operators.timeseries import (
    resample_ffill,
)

DDL = "k int, ts timestamp, v double, id long"


def _frame(spark):
    d = dt.datetime
    rows = [
        # key 1: days 1, 2, 5 observed -> 3 and 4 gap-filled from day 2
        (1, d(2024, 1, 1, 9), 10.0, 1),
        (1, d(2024, 1, 2, 8), 20.0, 2),
        (1, d(2024, 1, 2, 23), 25.0, 3),  # later same day wins
        (1, d(2024, 1, 5, 1), 50.0, 4),
        # key 2: a single day
        (2, d(2024, 3, 7, 12), 7.0, 5),
    ]
    return spark.createDataFrame(rows, DDL)


def test_grid_fill_and_latest_per_bucket(spark):
    out = resample_ffill(_frame(spark), "k", "ts", "v", unit="day", tie_break="id")
    got = {
        r.bucket_start.day: (r.v, r.filled) for r in out.collect() if r.k == 1
    }
    assert got == {
        1: (10.0, False),
        2: (25.0, False),  # latest observation of the bucket, not the first
        3: (25.0, True),   # gap carries day-2 value
        4: (25.0, True),
        5: (50.0, False),
    }


def test_per_key_ranges_are_independent(spark):
    out = resample_ffill(_frame(spark), "k", "ts", "v", unit="day", tie_break="id")
    k2 = [r for r in out.collect() if r.k == 2]
    assert len(k2) == 1 and k2[0].v == 7.0 and not k2[0].filled
    # every (key, bucket) exactly once, no nulls anywhere
    all_rows = out.collect()
    assert len({(r.k, r.bucket_start) for r in all_rows}) == len(all_rows)
    assert all(r.v is not None for r in all_rows)


def test_same_timestamp_ties_break_on_id(spark):
    d = dt.datetime
    df = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1.0, 10), (1, d(2024, 1, 1), 2.0, 11)], DDL
    )
    out = resample_ffill(df, "k", "ts", "v", unit="day", tie_break="id").collect()
    assert out[0].v == 2.0  # higher id wins the tie


def test_rejects_variable_width_units(spark):
    with pytest.raises(ValueError):
        resample_ffill(_frame(spark), "k", "ts", "v", unit="month")
