"""Cross-checks for the closed-form grouped OLS entry: the five-sum
normal-equation solution must agree with numpy's least squares on the same
points, and degenerate keys must be NULL, never a division error."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def _run(spark, rows):
    df = spark.createDataFrame(rows, "user_id bigint, x bigint, y bigint")

    def d38(c):
        return c.cast("decimal(38,0)")

    s = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y"))).alias("sy"),
        F.sum(d38(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(d38(F.col("x") * F.col("x"))).alias("sxx"),
    )
    def idiv_round(a, b):
        A = F.lit(2) * F.abs(a) + b
        B = F.lit(2) * b
        q = ((A - A % B) / B).cast("decimal(38,0)")
        return F.when(a < 0, -q).otherwise(q)

    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    m = F.lit(1_000_000).cast("decimal(38,0)")
    s6 = idiv_round(m * num, den)
    i6 = idiv_round(m * F.col("sy") - s6 * F.col("sx"), F.col("n").cast("decimal(38,0)"))
    out = s.select(
        "user_id",
        (s6.cast("double") / F.lit(1e6)).alias("slope"),
        (i6.cast("double") / F.lit(1e6)).alias("intercept"),
    )
    return {r.user_id: (r.slope, r.intercept) for r in out.collect()}


def test_ols_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    rows = []
    truth = {}
    for uid in range(5):
        xs = np.sort(rng.integers(0, 10_000, size=40))
        ys = (3 * uid - 7) * xs + rng.integers(-500, 500, size=40) + 1000
        rows += [(uid, int(x), int(y)) for x, y in zip(xs, ys)]
        truth[uid] = np.polyfit(xs.astype(float), ys.astype(float), 1)
    got = _run(spark, rows)
    for uid, (slope, intercept) in got.items():
        np.testing.assert_allclose(slope, truth[uid][0], rtol=1e-6, atol=1e-6)
        # the intercept deliberately reuses the 6-decimal MICRO-UNIT slope
        # (engine parity), shifting it by up to |slope quantization|·mean(x)
        # ≈ 5e-7 · 5e3 — tolerance sized to that design, not to fp noise
        np.testing.assert_allclose(intercept, truth[uid][1], atol=5e-3)


def test_ols_degenerate_keys_are_null(spark):
    rows = [
        (1, 5, 10), (1, 5, 20), (1, 5, 30),  # all same x -> NULL slope
        (2, 0, 7),                            # single point -> NULL slope
    ]
    got = _run(spark, rows)
    assert got[1] == (None, None)
    assert got[2] == (None, None)


def test_ols_entry_slope_recovers_known_trend(spark):
    # exact line y = 4x + 250 (cents): slope must come back exactly 4.0
    rows = [(9, x, 4 * x + 250) for x in range(0, 1000, 7)]
    got = _run(spark, rows)
    assert got[9] == (4.0, 250.0)
