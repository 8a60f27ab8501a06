"""Equi-width histogram: crafted distributions, clamping, mergeability."""

from __future__ import annotations

import pytest

from fdp_dynamically_controlled_streams_spark.operators.histogram import (
    equidepth_histogram,
    histogram,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_counts_and_bounds(spark):
    df = _vals(spark, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    got = {r.bin: (r.lo, r.hi, r.n) for r in histogram(df, "v", n_bins=2).collect()}
    # auto bounds [0, 9], width 4.5; 9.0 lands in the last bin (clamped edge)
    assert got[0] == (0.0, 4.5, 5)
    assert got[1] == (4.5, 9.0, 5)


def test_clamping_with_pinned_grid(spark):
    df = _vals(spark, [-100, 0.5, 1.5, 999])
    got = {r.bin: r.n for r in histogram(df, "v", 2, lo=0.0, hi=2.0).collect()}
    assert got == {0: 2, 1: 2}  # -100 -> bin 0, 999 -> bin 1: no lost mass


def test_nulls_excluded_and_all_null_empty(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    assert sum(r.n for r in histogram(df, "v", 4).collect()) == 2
    empty = spark.createDataFrame([(None,), (None,)], "v double")
    assert histogram(empty, "v", 4).count() == 0


def test_degenerate_range_single_bin(spark):
    df = _vals(spark, [7, 7, 7])
    got = histogram(df, "v", 5).collect()
    assert len(got) == 1 and got[0].bin == 0 and got[0].n == 3


def test_histograms_merge_binwise(spark):
    # same pinned grid on two halves == one histogram over the union
    all_ = list(range(100))
    a, b = all_[:37], all_[37:]
    kw = dict(n_bins=10, lo=0.0, hi=100.0)
    ha = {r.bin: r.n for r in histogram(_vals(spark, a), "v", **kw).collect()}
    hb = {r.bin: r.n for r in histogram(_vals(spark, b), "v", **kw).collect()}
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    hu = {r.bin: r.n for r in histogram(_vals(spark, all_), "v", **kw).collect()}
    assert merged == hu


def test_rejects_bad_args(spark):
    df = _vals(spark, [1])
    with pytest.raises(ValueError):
        histogram(df, "v", 0)
    with pytest.raises(ValueError):
        histogram(df, "v", 4, lo=0.0)


def test_equidepth_equal_mass(spark):
    # 0..99: quartile cutpoints land between data points -> 25 per bin
    df = _vals(spark, list(range(100)))
    got = {r.bin: (r.n, r.bin_min, r.bin_max) for r in equidepth_histogram(df, "v", 4).collect()}
    assert {b: n for b, (n, _, _) in got.items()} == {0: 25, 1: 25, 2: 25, 3: 25}
    assert got[0][1] == 0.0 and got[3][2] == 99.0


def test_equidepth_value_on_cutpoint_goes_low(spark):
    # n=5, median cut = exactly 3 (order stat): value 3 -> lower bin
    df = _vals(spark, [1, 2, 3, 4, 5])
    got = {r.bin: r.n for r in equidepth_histogram(df, "v", 2).collect()}
    assert got == {0: 3, 1: 2}


def test_equidepth_heavy_duplication_skips_bins(spark):
    df = _vals(spark, [1] * 90 + list(range(2, 12)))
    got = {r.bin: r.n for r in equidepth_histogram(df, "v", 4).collect()}
    assert got[0] == 90  # all duplicates collapse into bin 0; middle bins empty
    assert sum(got.values()) == 100


def test_equidepth_excludes_nulls_and_validates(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,), (3.0,)], "v double")
    assert sum(r.n for r in equidepth_histogram(df, "v", 2).collect()) == 3
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", 1)


def test_equidepth_approx_tier_runs(spark):
    df = _vals(spark, list(range(1000)))
    got = equidepth_histogram(df, "v", 4, approx=True).collect()
    assert sum(r.n for r in got) == 1000 and len(got) == 4


def test_exact_quantiles_matches_percentile_aggregate(spark):
    import random

    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.histogram import (
        exact_quantiles,
    )

    rng = random.Random(7)
    vals = [rng.uniform(-500, 500) for _ in range(5000)] + [42.0] * 50
    df = _vals(spark, vals)
    probs = [0.01, 0.125, 0.5, 0.875, 0.99]
    got = exact_quantiles(df, "v", probs)
    probs_sql = ", ".join(repr(p) + "D" for p in probs)
    want = df.agg(F.expr(f"percentile(v, array({probs_sql}))").alias("q")).collect()[0].q
    assert got == [float(x) for x in want]  # bit-exact, same interpolation


def test_exact_quantiles_gather_cap_fallback(spark):
    from fdp_dynamically_controlled_streams_spark.operators.histogram import (
        exact_quantiles,
    )

    # 10k copies of one value in the median bucket forces the fallback path.
    df = _vals(spark, [5.0] * 10_000 + [0.0, 10.0])
    got = exact_quantiles(df, "v", [0.5], gather_cap=100)
    assert got == [5.0]


def test_exact_quantiles_degenerate_inputs(spark):
    import math

    from fdp_dynamically_controlled_streams_spark.operators.histogram import (
        exact_quantiles,
    )

    all_equal = _vals(spark, [3.0] * 10)
    assert exact_quantiles(all_equal, "v", [0.25, 0.75]) == [3.0, 3.0]
    empty = spark.createDataFrame([(None,)], "v double")
    assert all(math.isnan(x) for x in exact_quantiles(empty, "v", [0.5]))


def test_exact_quantiles_nan_safe(spark):
    """NaN must not poison the bucket width (r2 ADVICE): quantiles are over
    the real values only, and all-NaN behaves like empty."""
    import math

    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.histogram import (
        exact_quantiles,
    )

    vals = [float(i) for i in range(100)]
    with_nan = _vals(spark, vals + [float("nan")] * 7)
    clean = _vals(spark, vals)
    probs = [0.1, 0.5, 0.9]
    probs_sql = ", ".join(repr(p) + "D" for p in probs)
    want = (
        clean.agg(F.expr(f"percentile(v, array({probs_sql}))").alias("q"))
        .collect()[0]
        .q
    )
    assert exact_quantiles(with_nan, "v", probs) == [float(x) for x in want]
    all_nan = _vals(spark, [float("nan")] * 5)
    assert all(math.isnan(x) for x in exact_quantiles(all_nan, "v", [0.5]))
