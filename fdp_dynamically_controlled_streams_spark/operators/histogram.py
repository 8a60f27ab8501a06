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


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    n_buckets: int = 8192,
    gather_cap: int = 2_000_000,
) -> list[float]:
    """Exact interpolated quantiles (DuckDB ``quantile_cont`` semantics)
    WITHOUT funneling every value through one reducer.

    Spark's exact ``percentile`` aggregate merges a value->count map of the
    whole column on a single final task — the same centralization as a
    global sort, plus hash-map overhead. This instead locates each needed
    order statistic with a bucket-count pass, then gathers only the buckets
    containing targets:

      1. one scan: (min, max, count);
      2. one scan: counts per equi-width bucket (``n_buckets`` rows total
         cross the wire, regardless of data size);
      3. cumulative counts locate the bucket + local rank of each of the
         ≤ 2*len(probs) order statistics; only those buckets\' values are
         gathered and locally selected (expected bucket population ≈
         n/n_buckets — tiny).

    Every stage is distributed and output-bounded, so the same code path
    holds at 100 TB. If pathological duplication concentrates more than
    ``gather_cap`` rows in the needed buckets (meaning those buckets are
    dominated by one repeated value), it falls back to the classic
    ``percentile`` aggregate for correctness.

    Interpolation matches Spark's ``percentile`` / DuckDB's ``quantile_cont``
    bit-for-bit: pos = p*(n-1);
    result = (ceil-pos) * v[floor] + (pos-floor) * v[ceil].
    """
    import bisect
    import math

    # NaN passes isNotNull and would poison max() (→ NULL bucket width);
    # drop it explicitly — quantiles are over real values, matching DuckDB's
    # NULL/NaN-ignoring quantile_cont. The three scans below assume `df` is
    # deterministic across jobs (a rand()-derived input could make the
    # bucket counts and the gathered values disagree — cache such inputs
    # first); the cumlist-vs-n guard before the gather falls back to the
    # single-pass `percentile` aggregate if that assumption is violated.
    v = F.col(col).cast("double")
    d = df.where(v.isNotNull() & ~F.isnan(v)).select(v.alias("__v"))
    row = d.agg(
        F.min("__v").alias("lo"), F.max("__v").alias("hi"), F.count("__v").alias("n")
    ).collect()[0]
    lo, hi, n = row.lo, row.hi, row.n
    if n == 0:
        return [float("nan")] * len(probs)
    if lo == hi:
        return [float(lo)] * len(probs)

    positions = [p * (n - 1) for p in probs]
    ranks = sorted({r for pos in positions for r in (math.floor(pos), math.ceil(pos))})

    width = (hi - lo) / n_buckets
    b = F.least(
        F.greatest(F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    counts = {
        r["__b"]: r["__n"]
        for r in d.groupBy(b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    cumlist: list[int] = []
    acc = 0
    for bi in range(n_buckets):
        acc += counts.get(bi, 0)
        cumlist.append(acc)

    by_bucket: dict[int, list[int]] = {}
    for r in ranks:
        bi = bisect.bisect_right(cumlist, r)  # first bucket with cum > r
        by_bucket.setdefault(bi, []).append(r)
    needed = sorted(by_bucket)

    # Fall back to the single-pass percentile aggregate when the needed
    # buckets are pathologically populated OR the second scan disagreed with
    # the first (non-deterministic input): correctness over distribution.
    if cumlist[-1] != n or sum(counts.get(bi, 0) for bi in needed) > gather_cap:
        probs_sql = ", ".join(repr(p) + "D" for p in probs)
        fallback = d.agg(
            F.expr(f"percentile(__v, array({probs_sql}))").alias("__q")
        ).collect()[0]["__q"]
        return [float(x) for x in fallback]

    cond = F.col("__v").isNull()  # vacuously false under the isNotNull filter
    for bi in needed:
        cond = cond | (b == F.lit(bi))
    vals = sorted(r["__v"] for r in d.where(cond).select("__v").collect())

    bucket_vals: dict[int, list[float]] = {}
    offset = 0
    for bi in needed:
        cnt = counts.get(bi, 0)
        bucket_vals[bi] = vals[offset : offset + cnt]
        offset += cnt

    stats: dict[int, float] = {}
    for bi, rs in by_bucket.items():
        base = cumlist[bi - 1] if bi > 0 else 0
        for r in rs:
            stats[r] = bucket_vals[bi][r - base]

    out = []
    for pos in positions:
        lo_r, hi_r = math.floor(pos), math.ceil(pos)
        vlo, vhi = stats[lo_r], stats[hi_r]
        if hi_r == lo_r:
            out.append(vlo)
        else:
            # Spark's Percentile uses the two-sided weighted form — keep it
            # bit-for-bit (1-ulp different from vlo + frac*(vhi-vlo)).
            out.append((hi_r - pos) * vlo + (pos - lo_r) * vhi)
    return out


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
    single-partition window — a non-starter. Exact cutpoints come from
    :func:`exact_quantiles` (bucket-count order-statistic selection — every
    stage distributed and output-bounded, unlike the ``percentile`` aggregate
    whose final merge buffers the whole column on one task); assignment is a
    codegen'd literal-array fold. ``approx=True`` swaps the cutpoint pass for
    approx_percentile's mergeable t-digest — one aggregate, bounded memory,
    when ±ε bin edges are acceptable at 100 TB.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    v = F.col(col).cast("double")
    probs = [i / n_bins for i in range(1, n_bins)]
    if approx:
        probs_sql = ", ".join(repr(p) + "D" for p in probs)
        cut_vals = df.agg(
            F.expr(f"approx_percentile({col}, array({probs_sql}), {accuracy})").alias("__q")
        ).collect()[0]["__q"]
        cut_vals = [float(x) for x in cut_vals]
    else:
        cut_vals = exact_quantiles(df, col, probs)
    cuts = F.array(*[F.lit(c) for c in cut_vals])
    binned = df.where(v.isNotNull()).select(
        F.aggregate(
            cuts,
            F.lit(0),
            lambda acc_, c: acc_ + F.when(v > c, 1).otherwise(0),
        ).alias("bin"),
        v.alias("__v"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("__v"), 6).alias("bin_min"),
        F.round(F.max("__v"), 6).alias("bin_max"),
    )
