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


def test_linear_interpolation_between_observations(spark):
    from fdp_dynamically_controlled_streams_spark.operators.timeseries import (
        resample_interpolate,
    )
    import datetime as dt

    d = dt.datetime
    # key 1: day1=10, day4=40 -> day2=20, day3=30; day5+ none (no trailing gap)
    # key 2: day1=5, then days 2-3 trailing after last obs? single obs only
    df = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 10.0, 1),
            (1, d(2024, 1, 4), 40.0, 2),
            (2, d(2024, 2, 1), 5.0, 3),
        ],
        DDL,
    )
    out = resample_interpolate(df, "k", "ts", "v", unit="day", tie_break="id")
    got = {(r.k, r.bucket_start.day): (round(r.v, 6), r.filled) for r in out.collect()}
    assert got == {
        (1, 1): (10.0, False),
        (1, 2): (20.0, True),
        (1, 3): (30.0, True),
        (1, 4): (40.0, False),
        (2, 1): (5.0, False),
    }


def test_trailing_gaps_carry_forward(spark):
    from fdp_dynamically_controlled_streams_spark.operators.timeseries import (
        resample_ffill,
        resample_interpolate,
    )
    import datetime as dt

    d = dt.datetime
    # Each key's grid ends at its max OBSERVED bucket, so in-range gaps
    # always have both neighbors; interpolation differs from ffill exactly
    # on those interior gaps (the carry-forward branch guards callers who
    # extend the grid past the last observation).
    df = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1.0, 1), (1, d(2024, 1, 3), 3.0, 2)], DDL
    )
    fi = resample_interpolate(df, "k", "ts", "v", unit="day", tie_break="id")
    ff = resample_ffill(df, "k", "ts", "v", unit="day", tie_break="id")
    assert [r.v for r in fi.orderBy("bucket_start").collect()] == [1.0, 2.0, 3.0]
    assert [r.v for r in ff.orderBy("bucket_start").collect()] == [1.0, 1.0, 3.0]


# ------------------------------------------------------------------- EWMA

from fdp_dynamically_controlled_streams_spark.operators.timeseries import ewma


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_ewma_hand_computed(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(hours=1), 20.0, 2),
        (1, t0 + dt.timedelta(hours=2), 30.0, 3),
    ]
    out = {r.event_id: r.ewma for r in ewma(_ev(spark, rows), "user_id", "ts", "value", "event_id", alpha=0.2).collect()}
    assert out[1] == 10.0
    assert out[2] == round(0.8 * 10.0 + 0.2 * 20.0, 6)  # 12.0
    assert out[3] == round(0.8 * 12.0 + 0.2 * 30.0, 6)  # 15.6


def test_ewma_singleton_is_identity(spark):
    import datetime as dt

    rows = [(u, dt.datetime(2024, 1, 1), float(u * 7), u) for u in range(1, 6)]
    out = ewma(_ev(spark, rows), "user_id", "ts", "value", "event_id").collect()
    assert all(r.ewma == r.value for r in out)


def test_ewma_tie_broken_by_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 100.0, 2), (1, t0, 0.0, 1)]  # same ts: id 1 first
    out = {r.event_id: r.ewma for r in ewma(_ev(spark, rows), "user_id", "ts", "value", "event_id", alpha=0.5).collect()}
    assert out[1] == 0.0
    assert out[2] == 50.0


def test_ewma_partition_invariance(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=i), float((i * u * 13) % 50), i)
        for u in range(1, 4)
        for i in range(40)
    ]
    df = _ev(spark, rows)
    a = sorted(map(tuple, ewma(df, "user_id", "ts", "value", "event_id").collect()))
    b = sorted(
        map(
            tuple,
            ewma(df.repartition(9), "user_id", "ts", "value", "event_id").collect(),
        )
    )
    assert a == b


def test_ewma_many_tiny_arrow_batches(spark):
    """Force the r12 mapInPandas EWMA kernel through tiny Arrow batches
    (maxRecordsPerBatch=3): a key's rows span many batches inside a
    partition, so the kernel's cross-batch state dict must resume each
    key's recurrence exactly — results equal the default batching."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=i), float((i * u * 7) % 31), u * 1000 + i)
        for u in range(1, 5)
        for i in range(25)
    ]
    df = _ev(spark, rows)
    want = sorted(
        map(tuple, ewma(df, "user_id", "ts", "value", "event_id").collect())
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = sorted(
            map(tuple, ewma(df, "user_id", "ts", "value", "event_id").collect())
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert got == want and len(want) == 100


def test_ewma_pandas_kernel_bit_parity_property(spark):
    """Property test for the pandas-ewm bit-parity claim (r13 ADVICE):
    pandas internally round-trips alpha -> com=(1-a)/a -> a'=1/(1+com);
    when the round-trip is EXACT (the catalog's 0.2, and 0.1/0.25/0.5
    etc.) ewm(adjust=False) is BIT-identical to the explicit
    y = (1-a)*y + a*x loop on distinct-valued runs.  When it is inexact
    (0.05, 1/3) the kernel runs at a 1-ulp-different alpha and outputs
    diverge sporadically at ulp scale.  On repeated-equal-value runs
    pandas additionally returns the running mean verbatim instead of
    recomputing (1-a)*v + a*v (a second ulp-scale carve-out).  Both
    divergences must stay invisible after the engine's 6-dp rounding.
    del spark: pure-kernel property, no cluster needed."""
    del spark
    import numpy as np
    import pandas as pd

    def explicit(x, a):
        y = np.empty_like(x)
        p = x[0]
        y[0] = p
        for i in range(1, len(x)):
            p = (1.0 - a) * p + a * x[i]
            y[i] = p
        return y

    rng = np.random.default_rng(20260816)
    for a in (0.05, 0.1, 0.2, 1.0 / 3.0, 0.5, 0.7, 0.875):
        assert (1.0 - a) + a == 1.0  # the precondition bit-parity rests on
        roundtrips = 1.0 / (1.0 + (1.0 - a) / a) == a
        if a in (0.1, 0.2, 0.25, 0.5):
            assert roundtrips  # the catalog's alpha class
        for trial in range(40):
            n = int(rng.integers(2, 60))
            x = rng.standard_normal(n) * 50.0
            repeated = trial % 3 == 0
            if repeated:  # inject an equal-value run (carve-out 2)
                x[: max(2, n // 2)] = x[0]
            got = pd.Series(x).ewm(alpha=a, adjust=False).mean().to_numpy()
            want = explicit(x, a)
            if roundtrips and not repeated:
                assert np.array_equal(got, want), (a, trial)
            else:
                # ulp-scale divergence relative to the series magnitude
                # (the perturbed-alpha error accumulates a few ulps of
                # max|x| before the contraction damps it) — orders of
                # magnitude below the 5e-7 half-width of the engine's
                # 6-dp rounding decision, asserted both ways
                err = np.abs(got - want)
                scale = np.max(np.abs(x)) + 1.0
                assert np.all(err <= 64.0 * np.spacing(scale))
                assert np.array_equal(np.round(got, 6), np.round(want, 6))
