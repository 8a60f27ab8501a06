"""Change-point detection over keyed time series: one-sided CUSUM.

The CUSUM recurrence S_i = max(0, S_{i-1} + (x_i - k)) looks inherently
sequential, but it has a closed window form:

    D_i = x_i - k,   P_i = running_sum(D),   S_i = P_i - min(0, running_min(P))

so the whole detector is TWO window expressions over the SAME
(partitionBy key, orderBy time) spec — Catalyst plans them in one Window
operator over one shuffle+sort, all JVM-side, no recursion, no Python.
That is the 100 TB shape: cost = one exchange on the key, then a linear
scan per partition.

Exactness: the running sum accumulates in frame order (deterministic with
a unique ordering), and DuckDB's ordered-frame window sum accumulates in
the same order, so S is bit-identical across engines before the cosmetic
1e-6 round.

[ABSENT in reference: SURVEY §2.7 — time-series engine extension.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_flags(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    drift: float,
    threshold: float,
) -> DataFrame:
    """Per key, in event order: S = max(0, S_prev + (value - drift)); rows
    with S > threshold are flagged as change points (sustained upward shift
    of the mean by more than ``drift``). ``order_cols`` must be a UNIQUE
    ordering within a key or the running sum is nondeterministic.

    Output: (key, *order_cols, value, cusum, flagged)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col("value") - F.lit(float(drift))).over(w)
    with_p = df.select(
        key_col, *order_cols, F.col(value_col).cast("double").alias("value")
    ).withColumn("_p", p)
    runmin = F.min("_p").over(w)
    s = F.col("_p") - F.least(F.lit(0.0), runmin)
    # The flag compares the ROUNDED cusum: S is a long float sum, so two
    # engines can land a hair's width on opposite sides of the threshold
    # (observed at sf0.1: a row whose S is exactly 200.0 at 1e-6). Rounding
    # first snaps both to the same grid point; > is then engine-stable.
    return with_p.select(
        key_col,
        *order_cols,
        F.round("value", 6).alias("value"),
        F.round(s, 6).alias("cusum"),
        (F.round(s, 6) > F.lit(float(threshold))).alias("flagged"),
    )


def cusum_flags_sql(
    table: str,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    drift: float,
    threshold: float,
    select_order: str | None = None,
) -> str:
    """DuckDB twin of :func:`cusum_flags` (identical frame-order
    accumulation)."""
    ob = ", ".join(order_cols)
    frame = (
        f"PARTITION BY {key_col} ORDER BY {ob} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    cols = ", ".join(order_cols)
    return f"""
WITH p AS (
  SELECT {key_col}, {cols}, CAST({value_col} AS DOUBLE) AS value,
         sum(CAST({value_col} AS DOUBLE) - {float(drift)!r}) OVER ({frame}) AS _p
  FROM {table}
), s AS (
  SELECT {key_col}, {cols}, value,
         _p - least(0.0, min(_p) OVER ({frame})) AS _s
  FROM p
)
SELECT {key_col}, {cols}, round(value, 6) AS value,
       round(_s, 6) AS cusum,
       round(_s, 6) > {float(threshold)!r} AS flagged
FROM s{f' ORDER BY {select_order}' if select_order else ''}
"""
