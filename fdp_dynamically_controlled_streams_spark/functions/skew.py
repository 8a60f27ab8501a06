"""Explicit skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.ENGINE_CONF) handles most skew at
runtime, but it only applies to sort-merge/shuffled-hash JOIN stages. Two
cases still need explicit salt at 100 TB:

  * aggregation skew — one giant group funnels into a single reducer; AQE
    cannot split a running aggregate. Fix: two-phase agg over (key, salt).
  * join skew where the build side must replicate — salting the probe side
    and exploding the build side bounds any one task's share of a hot key.

Both forms below are algebraic rewrites with exactly equal results (tested
against the unsalted plans), so they can be applied mechanically when key
histograms flag a hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Attach a uniform salt in [0, n_salts): xxhash64 of the per-row
    monotonic id, mod n_salts — deterministic within a run, no rand() in the
    plan. The hash matters: a bare ``mid % n_salts`` round-robin correlates
    with any key that tracks row position (e.g. a hot key defined on even
    ids lands only on even salts — caught by the skewagg_hotkey_stress
    test), while hashing decorrelates position from salt."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )


def salted_sum_count(
    df: DataFrame, keys: list[str], value: Column | str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe sum/count per key: phase 1 partial-aggregates on
    (keys + salt) — a hot key spreads over n_salts reducers — phase 2 merges
    the n_salts partials (tiny). Output: keys + (sum_value, n_rows)."""
    v = F.col(value) if isinstance(value, str) else value
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.sum(v).alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n_rows")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) big side, explode the small
    side across all salt values, join on keys + salt. Each hot-key task now
    handles ≤ 1/n_salts of that key. Small side grows ×n_salts — keep it the
    genuinely small side (it usually also broadcasts, making the salt free)."""
    salted_big = with_salt(big, n_salts)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, [*on, "_salt"], how).drop("_salt")
