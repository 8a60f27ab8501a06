"""Distinct-count sketching: KMV (k-minimum-values / bottom-k).

Spark ships HLL++ (`approx_count_distinct`), but its register layout is
engine-internal — the DuckDB oracle cannot reproduce its estimates, so it
can only ever get a rows-only check. KMV (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream") is the sketch that IS cross-engine
reproducible: hash every value, keep the k smallest **distinct** hashes per
group; with fewer than k distinct values the count is exact, otherwise

    estimate = (k - 1) * SPACE / h_(k)

where h_(k) is the k-th smallest hash and SPACE the hash range (2^60 for the
portable md5-derived hash, functions/hashing.py). Deterministic given the
hash function ⇒ the estimate hash-matches the SQL twin bit-for-bit, standard
error ≈ 1/sqrt(k-2) (~13% at k=64).

Scale shape: one `distinct` (map-side partial dedup, then a shuffle on
(group, hash)) followed by one per-group window over the *deduped* hash set.
The window sorts only distinct hashes, not raw rows — for a group with 10^9
raw rows but 10^6 distinct values, the sort input is the 10^6. For groups
whose distinct-set itself is huge, cap the sort by pre-filtering with a
hash ceiling (keep h < SPACE * oversample_k / est_lower_bound) before the
window — the bottom-k survives any such ceiling that admits ≥ k hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: range of the portable 60-bit hash.
SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group exact distinct count AND its KMV estimate, side by side.

    Output: group_cols + (n_exact, kmv_estimate, rel_err). ``n_exact`` is
    the count of distinct 60-bit hashes — identical to the oracle's, and
    equal to the true distinct count up to md5 collisions (~n²/2^61,
    negligible and, crucially, *the same* in both engines).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    hashes = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = hashes.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("_kth"),
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * (F.lit(float(SPACE)) / F.col("_kth"))))
    return (
        agg.withColumn("kmv_estimate", est)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact")) / F.col("n_exact"), 6
            ),
        )
        .drop("_kth")
    )


def kmv_distinct_sql(
    table: str, group_expr: str, group_alias: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same arithmetic)."""
    h = portable_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_expr} AS {group_alias}, {h} AS h FROM {table}
), ranked AS (
  SELECT {group_alias}, h,
         row_number() OVER (PARTITION BY {group_alias} ORDER BY h) AS rk
  FROM hashes
), agg AS (
  SELECT {group_alias},
         COUNT(*) AS n_exact,
         MAX(CASE WHEN rk = {k} THEN h END) AS kth
  FROM ranked GROUP BY {group_alias}
)
SELECT {group_alias}, n_exact,
       CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
            ELSE round({float(k - 1)} * ({float(SPACE)} / kth)) END AS kmv_estimate,
       round(abs(CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
                      ELSE round({float(k - 1)} * ({float(SPACE)} / kth)) END
                 - n_exact) / n_exact, 6) AS rel_err
FROM agg
"""
