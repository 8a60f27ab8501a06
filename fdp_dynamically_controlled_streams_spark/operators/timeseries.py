"""Time-series regularization: resample to a fixed grid + forward fill.

Sensor/telemetry streams are irregular (the reference's simulator emits one
reading per 10 s per sensor, Heater.scala:58-66, and its control stream one
record per 10 min — two cadences the controller reconciles with state).
Training pipelines and window models instead want a REGULAR grid per key
with gaps carried forward. This operator builds it Spark-first:

1. bucket observations to the grid (``date_trunc``) and keep the latest
   observation per (key, bucket) — one ``max_by`` aggregation (map-side
   combine, same shape as operators/merge.py::latest_by_key);
2. generate each key's full bucket range with ``sequence`` + ``explode`` —
   rows are produced inside the executors from (lo, hi) pairs, the grid is
   never collected or ranged on the driver;
3. left-join observations onto the grid — co-partitioned on (key, bucket),
   single shuffle each side;
4. forward-fill with ``last(ignorenulls) OVER (key ORDER BY bucket)`` — the
   same latest-value-propagation window the controller's batch twin uses
   (SURVEY §2.3 J1 mapping).

Gap rows are real rows with the carried value and ``filled = true`` — the
model-facing contract is "every key × bucket in range exists exactly once".

Scale: every step shuffles on the key (or key+bucket) only; grid size is
Σ per-key range/step — bounded by time span, not by input rows. Dense
multi-year × millisecond grids should resample at a coarser unit first
(grids are output-sized; don't materialize what the model won't read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-width units safe for sequence() stepping (months are not fixed)
STEP_UNITS = ("hour", "day", "week")


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    tie_break: str | None = None,
) -> DataFrame:
    """(key, bucket_start, value, filled): latest ``value_col`` per grid
    bucket, gaps forward-filled from the previous bucket. ``tie_break``
    orders observations within one timestamp (pass a unique id column for
    full determinism). The first bucket per key is always observed, so the
    fill never emits nulls."""
    if unit not in STEP_UNITS:
        raise ValueError(f"unit must be one of {STEP_UNITS} (fixed-width steps)")
    order = (
        F.struct(F.col(ts_col), F.col(tie_break))
        if tie_break
        else F.struct(F.col(ts_col))
    )
    obs = (
        df.withColumn("__b", F.date_trunc(unit, F.col(ts_col)))
        .groupBy(key, "__b")
        .agg(F.max_by(F.col(value_col), order).alias("__v"))
    )
    span = obs.groupBy(key).agg(F.min("__b").alias("lo"), F.max("__b").alias("hi"))
    grid = span.select(
        key,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit.upper()}"))
        ).alias("__b"),
    )
    joined = grid.join(obs, [key, "__b"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        F.col("__b").alias("bucket_start"),
        F.last("__v", ignorenulls=True).over(w).alias(value_col),
        F.col("__v").isNull().alias("filled"),
    )


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    tie_break: str | None = None,
) -> DataFrame:
    """Like :func:`resample_ffill` but gap buckets are LINEARLY interpolated
    between the surrounding observations; trailing gaps (no later
    observation) fall back to carry-forward. Same grid contract; both
    direction passes share ONE partitioning on the key (two window frames,
    no extra shuffle)."""
    filled = resample_ffill(df, key, ts_col, value_col, unit, tie_break)
    # recover the observed-only value column: ffill output marks gaps
    v_obs = F.when(~F.col("filled"), F.col(value_col))
    back = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    epoch = F.unix_timestamp("bucket_start")
    prev_v = F.last(v_obs, ignorenulls=True).over(back)
    prev_t = F.last(F.when(~F.col("filled"), epoch), ignorenulls=True).over(back)
    next_v = F.first(v_obs, ignorenulls=True).over(fwd)
    next_t = F.first(F.when(~F.col("filled"), epoch), ignorenulls=True).over(fwd)
    interp = F.when(
        ~F.col("filled"), F.col(value_col)  # observed: exact
    ).when(
        next_v.isNull(), prev_v  # trailing gap: carry forward
    ).otherwise(
        prev_v + (next_v - prev_v) * (epoch - prev_t) / (next_t - prev_t)
    )
    return filled.select(
        key, "bucket_start", interp.alias(value_col), "filled"
    )
