"""Embedding quantization for vector-store export: per-vector absmax int8,
the standard compression step between an embedding pipeline and an ANN
index (4× smaller than float32, dot products stay rank-faithful).

Everything is pure column expressions over ``array<float>`` (transform /
zip_with / aggregate — map-side only, ZERO shuffles: the report is a
projection of the corpus scan), with the same double-cast + left-fold
discipline as functions/vectors.py so every output value-hashes against the
DuckDB oracle. The quantized array itself is produced by
:func:`quantize_int8`; the catalog report emits exact integer checksums of
it (sums / full-scale counts) plus the reconstruction MSE, which pin every
element without putting an array column through the hash compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def absmax(vec: Column) -> Column:
    """max(|x|) over an array<numeric>, as double. Order-independent (max),
    so no fold-order caveats."""
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """array<int> of round(x / scale * 127); zero-vector guard -> all zeros.
    With absmax scaling values land in [-127, 127] by construction."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") / scale * F.lit(127)))
        .cast("int"),
    )


def quantize_report(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector quantization report: scale, dims, exact integer checksums
    of the quantized values (q_sum / q_abs_sum / n_at_full_scale) and the
    reconstruction MSE of dequantize(q) = q * scale / 127."""
    vec = F.col(vec_col)
    with_s = embeddings.select(
        id_col, vec_col, absmax(vec).alias("_s")
    ).withColumn("_q", quantize_int8(vec, F.col("_s")))
    sq_err = F.aggregate(
        F.zip_with(
            vec,
            F.col("_q"),
            lambda x, q: (
                x.cast("double") - q.cast("double") * F.col("_s") / F.lit(127)
            )
            * (x.cast("double") - q.cast("double") * F.col("_s") / F.lit(127)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return with_s.select(
        id_col,
        F.round(F.col("_s"), 6).alias("scale_absmax"),
        F.size(vec).alias("n_dims"),
        F.aggregate(F.col("_q"), F.lit(0).cast("bigint"), lambda a, v: a + v).alias(
            "q_sum"
        ),
        F.aggregate(
            F.col("_q"), F.lit(0).cast("bigint"), lambda a, v: a + F.abs(v)
        ).alias("q_abs_sum"),
        F.size(F.filter(F.col("_q"), lambda v: F.abs(v) == 127)).alias(
            "n_at_full_scale"
        ),
        F.round(sq_err / F.size(vec), 9).alias("recon_mse"),
    )


def quantize_report_sql(table: str = "embeddings", vec: str = "embedding") -> str:
    """DuckDB twin of :func:`quantize_report` — identical cast points,
    identical left-fold accumulation order for the MSE."""
    s = f"list_max(list_transform({vec}, x -> abs(CAST(x AS DOUBLE))))"
    q = (
        "list_transform({v}, x -> CAST(CASE WHEN s = 0 THEN 0 "
        "ELSE round(CAST(x AS DOUBLE) / s * 127) END AS INT))"
    ).format(v=vec)
    err_terms = (
        f"list_transform(list_zip({vec}, q), p -> "
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * s / 127)"
        " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * s / 127))"
    )
    return f"""
WITH scaled AS (SELECT vec_id, {vec}, {s} AS s FROM {table}),
quant AS (SELECT vec_id, {vec}, s, {q} AS q FROM scaled)
SELECT vec_id,
       round(s, 6) AS scale_absmax,
       len({vec}) AS n_dims,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_abs_sum,
       len(list_filter(q, v -> abs(v) = 127)) AS n_at_full_scale,
       round(list_reduce({err_terms}, (acc, v) -> acc + v) / len({vec}), 9)
           AS recon_mse
  FROM quant
"""
