"""Data-quality operators: column profiling and constraint validation.

A 100 TB ingest pipeline gates on data quality before anything downstream
(dedup, training splits) runs; the reference's only quality surface is the
bad-record parse filter (SURVEY §2.2 P4-P6). Two batch operators:

* ``profile_table`` — per-column null count / distinct count / min / max
  from ONE scan. Formulation matters: fusing k ``count_distinct`` with the
  plain aggregates in a single ``agg`` triggers Catalyst's multi-distinct
  rewrite — an Expand that replicates every row (k+1)× WITH all the
  non-distinct buffers, measured 4.5× slower than this shape at sf0.1.
  Instead the table is melted to narrow (column, value) rows (`inline`,
  map-only) and aggregated twice: (column, value) → per-value counts
  (map-side combine collapses to Σ per-column distincts before the
  exchange), then column → the profile. Two narrow shuffles, both sized by
  distinct-value cardinality, never by row count × column count. Distinct
  grouping uses the exact string form (injective for integral/decimal
  types — a double cast would merge bigints beyond 2^53); numeric extremes
  ride along as a per-group constant. At extreme distinct cardinalities
  swap in the KMV sketch (operators/sketches.py) per column instead.

* ``observe_constraints`` — the same rule metrics attached to a frame via
  ``df.observe``: violation counts ride whatever job materializes the data
  (the write path), zero extra scans — the at-scale default for monitoring;
  ``check_constraints`` remains the standalone-report form.

* ``check_constraints`` / ``split_by_constraints`` — declarative row rules
  (non-null, range, set membership, cross-column). `check_constraints`
  aggregates violation counts per rule in one pass; `split_by_constraints`
  routes rows into (valid, violations-with-rule-names) — the generalization
  of the controller's sentinel filter to arbitrary predicates, sharing the
  dead-letter shape (operators/deadletter.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
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
    numeric = {c for c in cols if _is_numeric(schema[c])}
    structs = []
    for c in cols:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                # exact value identity for the distinct count (null iff the
                # source value is null — cast never nulls a non-null)
                F.col(c).cast("string").alias("v_str"),
                (
                    F.col(c).cast("double")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("v_num"),
            )
        )
    melted = df.select(F.inline(F.array(*structs)))
    per_value = melted.groupBy("column", "v_str").agg(
        F.count(F.lit(1)).alias("cnt"),
        # constant within the group; min() just picks it
        F.min("v_num").alias("v_num"),
    )
    prof = per_value.groupBy("column").agg(
        F.sum(F.when(F.col("v_str").isNull(), F.col("cnt")).otherwise(0)).alias(
            "n_nulls"
        ),
        F.count(F.col("v_str")).alias("n_distinct"),
        F.min("v_num").alias("min_num"),
        F.max("v_num").alias("max_num"),
        F.min("v_str").alias("min_str"),
        F.max("v_str").alias("max_str"),
    )
    is_num = F.col("column").isin(*numeric) if numeric else F.lit(False)
    return prof.select(
        "column",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        F.when(~is_num, F.col("min_str")).alias("min_str"),
        F.when(~is_num, F.col("max_str")).alias("max_str"),
    )


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
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
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


def observe_constraints(
    df: DataFrame, rules: dict[str, Column], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach constraint metrics to ``df`` WITHOUT a second scan: returns
    (df, observation) where the observation yields ``{"n_rows": …,
    "<rule>": violations, …}`` after any action on the returned frame.

    This is the quality gate for the write path at 100 TB: violation counts
    ride the job that materializes the data (``df.observe`` aggregates
    inside the existing plan), instead of :func:`check_constraints`'s
    separate aggregation job. Null rule results count as violations, same
    3VL stance as the rest of this module."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(rule)
        for rule, cond in rules.items()
    ]
    return df.observe(obs, *metrics), obs


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


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int, redacted: str = "*"
) -> DataFrame:
    """k-anonymity suppression over string quasi-identifier columns: any
    quasi-identifier combination shared by fewer than ``k`` rows has those
    columns REDACTED (replaced by ``redacted``) so no released row's
    quasi-tuple identifies a group smaller than k — the release-gating
    governance pass of a data pipeline (complements content-level PII
    scrubbing in operators/textnorm.py).

    Scale shape: one groupBy over the quasi columns to find small groups
    (map-side combine; result is group-cardinality-sized) broadcast back
    onto the corpus as a semi-join flag — the corpus itself never
    shuffles. Note suppression is all-or-nothing per tuple here;
    generalization hierarchies (city→region→country) drop in by replacing
    the redaction literal with a coarser column."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    small = groups.where(F.col("_n") < k).select(
        *[F.col(c).alias(f"_q_{c}") for c in quasi_cols]
    )
    # NULL-safe equality: a quasi-tuple containing NULL is still an
    # identifiable group (groupBy treats NULL as a value), so the
    # suppression join must match it too — a plain equi-join would
    # silently release sub-k NULL-quasi rows unredacted.
    cond = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = term if cond is None else (cond & term)
    flagged = df.join(
        F.broadcast(small.withColumn("_suppress", F.lit(True))),
        cond,
        "left",
    ).drop(*[f"_q_{c}" for c in quasi_cols])
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(F.col("_suppress"), F.lit(redacted))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return flagged.select(*out_cols, F.coalesce("_suppress", F.lit(False)).alias("suppressed"))


def psi_drift_report(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    alert_at: float = 0.2,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric column
    — the standard drift gate between crawl/ingest generations before a
    training run (PSI < 0.1 stable, > 0.2 action).

    Buckets are FIXED-width over the declared [lo, hi) (out-of-range values
    clamp into the edge buckets), so both sides bucket map-side with zero
    coordination — no quantile pass, no driver round-trip; each side is one
    groupBy(bucket) count and the comparison joins n_buckets rows. Laplace
    (+1) smoothing makes empty buckets well-defined without epsilon
    hacks and keeps every proportion exactly representable:
    p_i = (c_i + 1) / (n + n_buckets).

    Output: one row per bucket (bucket, base_n, cur_n, psi_term) plus the
    ordering-stable total via a window — psi_term uses ln(), rounded 1e-6.
    """
    w = (float(hi) - float(lo)) / n_buckets

    def bucketize(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(w)
                ).cast("int"),
            ),
        )
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    from pyspark.sql import Window

    buckets = base.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    joined = (
        buckets.join(bucketize(base, "base_n"), "bucket", "left")
        .join(bucketize(current, "cur_n"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    tot = Window.partitionBy(F.lit(1))
    p = (F.col("base_n") + 1) / (F.sum("base_n").over(tot) + F.lit(n_buckets))
    q = (F.col("cur_n") + 1) / (F.sum("cur_n").over(tot) + F.lit(n_buckets))
    term = (q - p) * F.log(q / p)
    return joined.select(
        "bucket",
        "base_n",
        "cur_n",
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(tot), 6).alias("psi_total"),
        (F.sum(term).over(tot) > F.lit(float(alert_at))).alias("drifted"),
    )


def psi_drift_sql(
    base_sql: str,
    current_sql: str,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    alert_at: float = 0.2,
) -> str:
    """DuckDB twin of :func:`psi_drift_report` (``base_sql``/``current_sql``
    are subqueries yielding the two snapshots)."""
    w = (float(hi) - float(lo)) / n_buckets
    b = (
        f"least({n_buckets - 1}, greatest(0, CAST(floor("
        f"(CAST({value_col} AS DOUBLE) - {float(lo)!r}) / {w!r}) AS INT)))"
    )
    return f"""
WITH buckets AS (SELECT unnest(range({n_buckets})) AS bucket),
a AS (SELECT {b} AS bucket, count(*) AS base_n FROM ({base_sql})
      WHERE {value_col} IS NOT NULL GROUP BY 1),
c AS (SELECT {b} AS bucket, count(*) AS cur_n FROM ({current_sql})
      WHERE {value_col} IS NOT NULL GROUP BY 1),
j AS (
  SELECT CAST(b.bucket AS INT) AS bucket,
         coalesce(a.base_n, 0) AS base_n, coalesce(c.cur_n, 0) AS cur_n
  FROM buckets b LEFT JOIN a ON a.bucket = b.bucket
                 LEFT JOIN c ON c.bucket = b.bucket
), t AS (
  SELECT bucket, base_n, cur_n,
         (CAST(cur_n + 1 AS DOUBLE) / (sum(cur_n) OVER () + {n_buckets})
          - CAST(base_n + 1 AS DOUBLE) / (sum(base_n) OVER () + {n_buckets}))
         * ln((CAST(cur_n + 1 AS DOUBLE) / (sum(cur_n) OVER () + {n_buckets}))
            / (CAST(base_n + 1 AS DOUBLE) / (sum(base_n) OVER () + {n_buckets})))
         AS term
  FROM j
)
SELECT bucket, base_n, cur_n, round(term, 6) AS psi_term,
       round(sum(term) OVER (), 6) AS psi_total,
       sum(term) OVER () > {float(alert_at)!r} AS drifted
FROM t
"""


def mad_outliers(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
    z_cut: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags via the modified z-score
    (Iglewicz-Hoaglin): rz = 0.6745 * (x - median) / MAD, flagged at
    |rz| > ``z_cut``. Median/MAD are EXACT interpolated order statistics
    (the engine-stable statistic — no accumulation order), each rounded
    1e-6 before use so the derived columns are bit-identical across
    engines. Degenerate groups (MAD = 0, i.e. >50% of the group at the
    median) flag nothing — a zero spread gives no outlier scale.

    Scale shape: two grouped exact-percentile aggregations over the same
    key (the per-group stats tables are group-cardinality-sized and
    broadcast back onto the fact scan), one map-side projection for the
    flags. At 100 TB swap `percentile` for `approx_percentile` — same
    call shape, same plan.

    [ABSENT in reference: SURVEY §2.7 — quality-gate engine extension.]
    """
    med = (
        df.groupBy(key_col)
        .agg(F.round(F.expr(f"percentile({val_col}, 0.5D)"), 6).alias("_med"))
    )
    with_med = df.join(F.broadcast(med), key_col)
    mad = (
        with_med.groupBy(key_col)
        .agg(
            F.round(
                F.expr(f"percentile(abs({val_col} - _med), 0.5D)"), 6
            ).alias("_mad")
        )
    )
    out = with_med.join(F.broadcast(mad), key_col)
    rz = F.round(
        F.lit(0.6745) * (F.col(val_col) - F.col("_med")) / F.col("_mad"), 6
    )
    return out.select(
        F.col(id_col),
        F.col(key_col),
        F.round(F.col(val_col), 6).alias("value"),
        F.col("_med").alias("group_median"),
        F.col("_mad").alias("group_mad"),
        F.when(F.col("_mad") > 0, rz).otherwise(F.lit(0.0)).alias("robust_z"),
        F.when(F.col("_mad") > 0, F.abs(rz) > z_cut)
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )


def mad_outliers_sql(
    table: str,
    key_col: str,
    val_col: str,
    id_col: str,
    z_cut: float = 3.5,
) -> str:
    """DuckDB twin of :func:`mad_outliers` (quantile_cont = Spark's exact
    interpolated percentile; identical rounding boundaries)."""
    return f"""
WITH med AS (
  SELECT {key_col}, round(quantile_cont({val_col}, 0.5), 6) AS _med
  FROM {table} GROUP BY {key_col}
), wm AS (
  SELECT t.*, m._med FROM {table} t JOIN med m USING ({key_col})
), mad AS (
  SELECT {key_col}, round(quantile_cont(abs({val_col} - _med), 0.5), 6) AS _mad
  FROM wm GROUP BY {key_col}
)
SELECT w.{id_col}, w.{key_col},
       round(w.{val_col}, 6) AS value,
       w._med AS group_median,
       d._mad AS group_mad,
       CASE WHEN d._mad > 0
            THEN round(0.6745 * (w.{val_col} - w._med) / d._mad, 6)
            ELSE 0.0 END AS robust_z,
       CASE WHEN d._mad > 0
            THEN abs(round(0.6745 * (w.{val_col} - w._med) / d._mad, 6))
                 > {float(z_cut)!r}
            ELSE FALSE END AS is_outlier
FROM wm w JOIN mad d USING ({key_col})
"""


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = 2,
) -> DataFrame:
    """Distinct l-diversity audit — the companion gate to
    :func:`k_anonymize`: k-anonymity bounds group SIZE, but a group whose
    sensitive attribute is constant still leaks it; this reports, per
    quasi-identifier group, the row count and the number of DISTINCT
    sensitive values, flagging groups below ``l_min``. NULL sensitive
    values don't count toward diversity (count(DISTINCT) skips NULL in
    both engines); NULL quasi values form their own group (GROUP BY
    null-equality, identical in both engines).

    Scale shape: ONE groupBy with map-side partial aggregation — the
    output is group-cardinality-sized. Release gating then joins this
    table back exactly like k_anonymize's suppression join.

    [ABSENT in reference: SURVEY §2.7 — governance engine extension.]
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("n_distinct_sensitive"),
        )
        .select(
            *quasi_cols,
            "n_rows",
            "n_distinct_sensitive",
            (F.col("n_distinct_sensitive") >= l_min).alias("diverse"),
        )
    )


def l_diversity_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = 2,
) -> str:
    """DuckDB twin of :func:`l_diversity_report`."""
    q = ", ".join(quasi_cols)
    return f"""
SELECT {q}, count(*) AS n_rows,
       count(DISTINCT {sensitive_col}) AS n_distinct_sensitive,
       count(DISTINCT {sensitive_col}) >= {l_min} AS diverse
FROM {table} GROUP BY {q}
"""
