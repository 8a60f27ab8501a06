"""Vector math over ``array<float>`` embedding columns — pure column
expressions (``zip_with``/``aggregate``), no UDF, so Catalyst keeps the whole
similarity plan in codegen. The pandas-UDF fallback exists for very wide
vectors where per-element expression trees get slow to compile.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (element order, exact plan)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Sign-quantization LSH bucket id from the first ``bits`` dimensions:
    bucket = Σ (a[i] > 0) << i. Cheap, deterministic, ANSI-SQL-portable —
    the scale path for ANN: shuffle by bucket, search within bucket."""
    terms = [
        (F.element_at(a, i + 1) > 0).cast("bigint") * F.lit(1 << i) for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _fold_sum_sql(products: str) -> str:
    # list_reduce is a left fold like Spark's F.aggregate — bit-identical
    # double accumulation order (list_sum may use a different summation order).
    return f"list_reduce({products}, (acc, v) -> acc + v)"


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (same element-order left-fold)."""
    return _fold_sum_sql(
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )


def norm_sql(a: str) -> str:
    """DuckDB twin of :func:`norm`."""
    sq = f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"sqrt({_fold_sum_sql(sq)})"


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` (same element-order left-fold accumulation)."""
    dot_ab = _fold_sum_sql(
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )
    sq = "list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return (
        f"{dot_ab} / (sqrt({_fold_sum_sql(sq.format(v=a))})"
        f" * sqrt({_fold_sum_sql(sq.format(v=b))}))"
    )


def sign_bucket_sql(a: str, bits: int = 8) -> str:
    terms = " + ".join(
        f"CAST({a}[{i + 1}] > 0 AS BIGINT) * {1 << i}" for i in range(bits)
    )
    return f"({terms})"
