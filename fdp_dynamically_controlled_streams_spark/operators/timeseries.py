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


EWMA_SCHEMA = "user_id long, event_id long, value double, ewma double"


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    alpha: float = 0.2,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over event time:
    y_0 = x_0, y_i = (1-α)·y_{i-1} + α·x_i, ties on ``ts_col`` broken by
    ``id_col``. Output is (key, id, value, ewma) with ewma rounded 1e-6
    at the boundary only — the recurrence itself runs in raw doubles
    with EXACTLY the expression shape the DuckDB twin replays
    ((1-α)*prev + α*x, same op order), so results value-hash.

    Why not a closed-form window expression: the algebraic prefix trick
    (y_i = α·(1-α)^i · Σ x_j/(1-α)^j) overflows double for series longer
    than ~700 points at α=0.2 — the recurrence is the numerically honest
    form. So this is the CUSUM-class sequential operator: batch form
    here is ONE shuffle (groupBy key) + an Arrow-batched per-group scan
    (applyInPandas, vectorized sort + tight loop); per-key state is one
    double, so the streaming twin is applyInPandasWithState exactly like
    streaming/cusum.py. Keys are independent — 100 TB parallelism is
    across keys, as for any per-entity recurrence.

    [ABSENT in reference: SURVEY §2.7 — time-series engine extension.]
    """
    # ONE mapInPandas scan per partition instead of applyInPandas per KEY
    # (r12: with ~10k users per 100k events the per-group Arrow/pandas
    # dispatch dominated the entry — one kernel call per key). Keys are
    # hash-partitioned and sorted (key, ts, id) within each partition;
    # the kernel carries per-key state in a dict ACROSS Arrow batches of
    # its partition, so any maxRecordsPerBatch chunking yields the same
    # recurrence (same guarantee class as the rolling-hash kernel's
    # cross-batch law). Identical op order per key -> identical doubles.
    # The recurrence itself runs through pandas' C-implemented grouped
    # ewm (adjust=False computes y_i = (1-α)·y_{i-1} + α·x_i; the r12
    # per-row Python loop measured ~30× slower per element).  Bit-parity
    # with the explicit loop (and hence the DuckDB recursive-CTE oracle)
    # is NOT unconditional (r13 ADVICE; mechanism pinned down this
    # round, tests/test_timeseries.py property test):
    #  (1) pandas round-trips α → com=(1-α)/α → α'=1/(1+com) internally;
    #      when that round-trip is inexact (e.g. α=0.05 or 1/3) the
    #      kernel runs the recurrence at a 1-ulp-different α', giving
    #      sporadic 1-ulp output differences.  The catalog's α=0.2
    #      round-trips EXACTLY (as do 0.1/0.125/0.25/0.5), so bit-parity
    #      holds there — asserted per-α in the property test.
    #  (2) pandas skips the update when x_i equals the running mean and
    #      returns it verbatim, while the explicit arithmetic computes
    #      (1-α)·v + α·v — up to 1 ulp apart on repeated-equal runs.
    # Both divergences are ulp-bounded (the recurrence is contractive)
    # and invisible after the 6-dp HALF_UP rounding below except exactly
    # AT a 6-dp half-way boundary — measure-zero for measured data, and
    # property-tested round-6-equal across engines. Cross-batch state is handled by PREPENDING
    # one synthetic sample per carried key: seeding the ewm with the
    # carried value p makes its next step (1-α)·p + α·x_0 — the exact
    # recurrence continuation (bit-verified) — then the prefix rows are
    # dropped from the output.
    def kernel(batches):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="float64"),
                "ewma": pd.Series([], dtype="float64"),
            }
        )
        state: dict[int, float] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                yield empty
                continue
            k = pdf[key_col].to_numpy(dtype="int64")
            x = pdf[val_col].to_numpy(dtype="float64")
            ids = pdf[id_col].to_numpy(dtype="int64")
            uk = np.unique(k)  # rows arrive sorted by key: unique = keys
            carry = uk[[kk in state for kk in uk]] if state else uk[:0]
            if len(carry):
                kk2 = np.concatenate([carry, k])
                xx = np.concatenate(
                    [np.array([state[kk] for kk in carry]), x]
                )
            else:
                kk2, xx = k, x
            fr = pd.DataFrame({"k": kk2, "x": xx})
            y_all = (
                fr.groupby("k", sort=False)["x"]
                .ewm(alpha=alpha, adjust=False)
                .mean()
                .droplevel(0)
                .sort_index()
                .to_numpy()
            )
            y = y_all[len(carry):]
            # last row per key within the (key-sorted) batch = the
            # carried state for the next Arrow batch
            last_idx = np.nonzero(np.append(k[1:] != k[:-1], True))[0]
            state.update(zip(k[last_idx].tolist(), y[last_idx].tolist()))
            yield pd.DataFrame(
                {"user_id": k, "event_id": ids, "value": x, "ewma": y}
            )

    out = (
        df.select(key_col, ts_col, val_col, id_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, ts_col, id_col)
        .mapInPandas(kernel, EWMA_SCHEMA)
    )
    # Rounding happens JVM-side so the Spark/DuckDB pairing stays the
    # repo's established HALF_UP round ↔ round (np.round is half-even).
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("ewma", 6).alias("ewma"),
    )


def ewma_sql(
    table: str,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    alpha: float = 0.2,
) -> str:
    """DuckDB twin of :func:`ewma`: the recurrence unrolled as a recursive
    CTE stepping row_number order, identical float expression shape."""
    a = float(alpha)
    return f"""
WITH RECURSIVE s AS (
  SELECT {key_col} AS k, {id_col} AS id, {val_col} AS x,
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {ts_col}, {id_col}) AS rn
  FROM {table}
), r AS (
  SELECT k, id, x, rn, x AS y FROM s WHERE rn = 1
  UNION ALL
  SELECT s.k, s.id, s.x, s.rn, ({1.0 - a!r}) * r.y + ({a!r}) * s.x
  FROM r JOIN s ON s.k = r.k AND s.rn = r.rn + 1
)
SELECT k AS user_id, id AS event_id,
       round(x, 6) AS value, round(y, 6) AS ewma
FROM r
"""
