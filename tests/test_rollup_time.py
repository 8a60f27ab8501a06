"""Multi-resolution rollup: crafted frame with known per-level totals."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.rollup_time import (
    rollup_time_hierarchy,
)


def _frame(spark):
    rows = [
        # two hours inside one day, plus one row in the next month
        (dt.datetime(2024, 1, 1, 10, 15), "a", 1.0),
        (dt.datetime(2024, 1, 1, 10, 45), "a", 2.0),
        (dt.datetime(2024, 1, 1, 11, 5), "b", 4.0),
        (dt.datetime(2024, 2, 3, 9, 0), "a", 8.0),
        (None, "a", 16.0),  # null event time: null bucket at every grain
    ]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def _collect(df):
    return {
        (r.grain, r.bucket_start, getattr(r, "k", None)): (r.total, r.n)
        for r in df.collect()
    }


def test_levels_from_one_pass(spark):
    out = rollup_time_hierarchy(
        _frame(spark),
        "ts",
        ["hour", "day", "month"],
        {"total": F.sum("v"), "n": F.count(F.lit(1))},
    )
    got = {(r.grain, r.bucket_start): (r.total, r.n) for r in out.collect()}
    h10 = dt.datetime(2024, 1, 1, 10)
    assert got[("hour", h10)] == (3.0, 2)
    assert got[("hour", dt.datetime(2024, 1, 1, 11))] == (4.0, 1)
    assert got[("day", dt.datetime(2024, 1, 1))] == (7.0, 3)
    assert got[("month", dt.datetime(2024, 1, 1))] == (7.0, 3)
    assert got[("month", dt.datetime(2024, 2, 1))] == (8.0, 1)
    # null ts -> exactly one null bucket PER grain, never merged into a real
    # bucket and never mistaken for a coarser level
    assert got[("hour", None)] == (16.0, 1)
    assert got[("day", None)] == (16.0, 1)
    assert got[("month", None)] == (16.0, 1)
    # cardinality: 3 hours + 3 days(2 real+null) ... exact count
    assert len(got) == 4 + 3 + 3


def test_keys_partition_buckets(spark):
    out = rollup_time_hierarchy(
        _frame(spark),
        "ts",
        ["day"],
        {"total": F.sum("v"), "n": F.count(F.lit(1))},
        keys=["k"],
    )
    got = _collect(out)
    d1 = dt.datetime(2024, 1, 1)
    assert got[("day", d1, "a")] == (3.0, 2)
    assert got[("day", d1, "b")] == (4.0, 1)


def test_rejects_unknown_granularity(spark):
    with pytest.raises(ValueError, match="fortnight"):
        rollup_time_hierarchy(_frame(spark), "ts", ["fortnight"], {"n": F.count("*")})


def test_single_scan_single_shuffle(spark):
    out = rollup_time_hierarchy(
        _frame(spark).repartition(4),
        "ts",
        ["hour", "day", "month"],
        {"total": F.sum("v")},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    # exactly one exchange beyond the explicit repartition: the agg shuffle
    assert plan.count("Exchange hashpartitioning") == 1
