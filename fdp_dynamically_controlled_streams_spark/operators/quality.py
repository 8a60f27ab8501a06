"""Data-quality operators: column profiling and constraint validation.

A 100 TB ingest pipeline gates on data quality before anything downstream
(dedup, training splits) runs; the reference's only quality surface is the
bad-record parse filter (SURVEY §2.2 P4-P6). Two batch operators:

* ``profile_table`` — per-column null count / distinct count / min / max in
  ONE aggregation pass over the table (a single reduce produces every
  metric; the row-per-column shape comes from `inline` on the aggregated
  struct array, not from k per-column jobs). Exact `count(distinct)` per
  column compiles to Catalyst's Expand (one input row fans out per distinct
  aggregate) — at extreme widths swap in the KMV sketch
  (operators/sketches.py) per column instead.

* ``check_constraints`` / ``split_by_constraints`` — declarative row rules
  (non-null, range, set membership, cross-column). `check_constraints`
  aggregates violation counts per rule in one pass; `split_by_constraints`
  routes rows into (valid, violations-with-rule-names) — the generalization
  of the controller's sentinel filter to arbitrary predicates, sharing the
  dead-letter shape (operators/deadletter.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str). Numeric extremes land in the ``_num`` pair (double),
    everything else — cast to string — in the ``_str`` pair, so the output
    schema is uniform without lossy number→text formatting."""
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if _is_numeric(schema[c]):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
    one = df.agg(*aggs)
    structs = []
    for c in cols:
        num = _is_numeric(schema[c])
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min") if num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"{c}__max") if num else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if num else F.col(f"{c}__min")).alias("min_str"),
                (F.lit(None).cast("string") if num else F.col(f"{c}__max")).alias("max_str"),
            )
        )
    return one.select(F.inline(F.array(*structs)))


def profile_table_sql(table: str, columns: list[tuple[str, bool]]) -> str:
    """DuckDB twin of :func:`profile_table`; ``columns`` = (name, is_numeric)."""
    parts = []
    for c, num in columns:
        min_num = f"CAST(min({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(max({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        min_str = "CAST(NULL AS VARCHAR)" if num else f"min(CAST({c} AS VARCHAR))"
        max_str = "CAST(NULL AS VARCHAR)" if num else f"max(CAST({c} AS VARCHAR))"
        parts.append(
            f"SELECT '{c}' AS column, "
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{min_num} AS min_num, {max_num} AS max_num, "
            f"{min_str} AS min_str, {max_str} AS max_str FROM {table}"
        )
    return " UNION ALL ".join(parts)


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Violation counts per rule in one pass: (rule, n_violations, n_rows).
    A rule is a boolean Column that is True for VALID rows; null counts as a
    violation (SQL three-valued logic never hides a failure)."""
    aggs = [
        F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(name)
        for name, cond in rules.items()
    ]
    one = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(name).alias("n_violations"),
            F.col("_n").alias("n_rows"),
        )
        for name in rules
    ]
    return one.select(F.inline(F.array(*structs)))


def split_by_constraints(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, violating_rows + ``failed_rules`` array<string>): one scan,
    rules evaluated as columns; a row is valid iff every rule passes."""
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.where(F.size("failed_rules") > 0)
    return valid, bad
