"""Equi-width histograms: exact, mergeable numeric distribution profiles.

Completes the data-quality surface (operators/quality.py gives nulls/
distincts/extremes; this gives shape). Exact and deterministic — unlike
sampled `summary()` sketches — and mergeable by construction: two
histograms over the same (lo, hi, n_bins) grid add bin-wise, so per-
partition / per-day profiles roll up without re-scanning raw data (same
re-aggregability argument as the KMV sketch, operators/sketches.py).

Two-pass by necessity (bounds, then counts) unless the caller pins the
grid: pass explicit ``lo``/``hi`` — the common case for monitored pipelines
where the grid is part of the contract — and it is ONE scan with a single
output-sized shuffle. Bin assignment is a closed-form floor expression
(whole-stage codegen, no UDF); clamping puts out-of-range rows in the edge
bins so a drifting upstream never silently drops mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Per-bin counts for ``col``: (bin, lo, hi, n). ``bin`` ∈ [0, n_bins);
    values are clamped into the edge bins; nulls are excluded (they are
    profile_table's n_nulls, not a distribution point). If ``lo``/``hi``
    are omitted they are computed in a first pass; a degenerate range
    (lo == hi) collapses to bin 0."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    if lo is None:
        row = df.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi = row.lo, row.hi
        if lo is None:  # all-null column
            return df.sparkSession.createDataFrame(
                [], "bin int, lo double, hi double, n long"
            )
    width = (hi - lo) / n_bins if hi > lo else 1.0
    v = F.col(col).cast("double")
    raw_bin = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.where(v.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )


def histogram_sql(
    table: str, col: str, n_bins: int, lo: float, hi: float
) -> str:
    """DuckDB twin of :func:`histogram` with a pinned grid."""
    width = (hi - lo) / n_bins if hi > lo else 1.0
    return f"""
SELECT bin,
       {lo} + bin * {width} AS lo,
       {lo} + (bin + 1) * {width} AS hi,
       count(*) AS n
  FROM (SELECT least(greatest(
                 CAST(floor(({col} - {lo}) / {width}) AS INT), 0),
                 {n_bins - 1}) AS bin
          FROM {table}
         WHERE {col} IS NOT NULL)
 GROUP BY bin
"""


def equidepth_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantile (equi-depth) histogram: bin edges at the i/n_bins exact
    interpolated percentiles, so each bin holds ~equal mass — the right
    profile for heavy-tailed columns where equi-width wastes most bins.

    Returns (bin, n, bin_min, bin_max); ``bin`` = number of cutpoints
    strictly below the value (values equal to a cutpoint go to the lower
    bin), so bins can be empty only under extreme duplication. Nulls are
    excluded.

    Scale: the rank-based alternative (ntile over a global ORDER BY) needs a
    single-partition window — a non-starter. Here the k-1 cutpoints are ONE
    aggregate row broadcast back, and assignment is a codegen'd array fold:
    two scans, no global sort. ``approx=True`` swaps the exact percentile
    (which buffers values per partition) for approx_percentile's mergeable
    t-digest — same call shape, bounded memory at 100 TB.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    v = F.col(col).cast("double")
    probs = ", ".join(repr(i / n_bins) + "D" for i in range(1, n_bins))
    fn = "approx_percentile" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    cuts = df.agg(F.expr(f"{fn}({col}, array({probs}){acc})").alias("__cuts"))
    binned = (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(cuts))
        .select(
            F.aggregate(
                "__cuts",
                F.lit(0),
                lambda acc_, c: acc_ + F.when(v > c, 1).otherwise(0),
            ).alias("bin"),
            v.alias("__v"),
        )
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("__v"), 6).alias("bin_min"),
        F.round(F.max("__v"), 6).alias("bin_max"),
    )
