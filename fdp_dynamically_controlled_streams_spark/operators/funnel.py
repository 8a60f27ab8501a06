"""Behavioral analytics over event streams: ordered funnels and retention
cohorts.

The reference has no analytics surface at all (its only query is the
controller, SparkStructuredController.scala:96-118); these are charter
extensions for the event-table workloads an analytics engine must serve,
built to hold their shape at 100 TB:

**funnel_steps** — ordered multi-step conversion. The naive form is one
join + aggregation per step (k shuffles for a k-step funnel). Instead each
step timestamp is a conditional ``min() OVER (PARTITION BY user)`` that
references the previous step's column: step k's window can only see events
at/after step k-1's timestamp. All window operators share ONE hash
partitioning by user, so an arbitrary-depth funnel costs exactly one
shuffle of the events table; Catalyst stacks the Window operators without
re-exchanging. ``max_span`` bounds the whole funnel to a time window
anchored at step 1 (the usual "converted within N days" semantics).

**funnel_counts** — collapses per-user step timestamps to the step-level
report (users reached + conversion vs step 1). Per-user rows are
aggregated with one tiny k-row result; no second scan of events.

**retention_cohorts** — classic triangle: cohort = the user's first active
period, offset = periods since cohort, cell = distinct active users. The
cohort assignment is again a whole-partition ``min() OVER`` sharing the
one shuffle by user; (cohort, offset) distinct-user counts then aggregate
on a key space bounded by periods², independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.exactround import dratio


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: str | None = None,
) -> DataFrame:
    """Per-user funnel step timestamps: one row per user who completed step
    1, with ``step{i}_ts`` the earliest time step i could be completed in
    order (NULL once the user drops out).

    A step counts only if it happens at/after the previous step's timestamp
    (same-timestamp events count in order — ties are inclusive), and, when
    ``max_span`` is given (an INTERVAL string like ``'7 days'``), no later
    than step 1's timestamp + span.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev = None
    deadline = None
    for i, step in enumerate(steps, start=1):
        col = f"step{i}_ts"
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
            if deadline is not None:
                cond = cond & (F.col(ts_col) <= F.col(deadline))
        out = out.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        if i == 1 and max_span is not None:
            out = out.withColumn(
                "funnel_deadline",
                F.col(col) + F.expr(f"INTERVAL {max_span}"),
            )
            deadline = "funnel_deadline"
        prev = col
    step_cols = [f"step{i}_ts" for i in range(1, len(steps) + 1)]
    return (
        out.select(user_col, *step_cols)
        .where(F.col("step1_ts").isNotNull())
        .dropDuplicates([user_col])
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: str | None = None,
) -> DataFrame:
    """Step-level funnel report: (step, step_name, users_reached,
    conversion) where conversion is users_reached / step-1 users rounded to
    6 decimals. Exactly one shuffle of events (see module docstring)."""
    per_user = funnel_steps(df, user_col, ts_col, type_col, steps, max_span)
    counts = per_user.agg(
        *[
            F.count(f"step{i}_ts").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # k-row unpivot of the 1-row aggregate: stack() carries n1 alongside so
    # conversion needs no extra pass or window.
    pairs = ", ".join(
        f"{i}, '{name}', n{i}" for i, name in enumerate(steps, start=1)
    )
    return (
        counts.selectExpr(
            f"stack({len(steps)}, {pairs}) AS (step, step_name, users_reached)",
            "n1",
        )
        .withColumn(
            "conversion", dratio(F.col("users_reached"), F.col("n1"), 6)
        )
        .drop("n1")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    unit: str = "day",
    max_offset: int | None = None,
) -> DataFrame:
    """Retention triangle: (cohort, offset, n_users) = distinct users from
    the cohort (first activity period, truncated to ``unit``) active again
    ``offset`` periods later, plus retention = n_users / cohort size.

    unit: 'day' | 'week' | 'month'. Offsets are exact period differences
    (days / weeks via datediff/7 on week-truncated dates / calendar months).
    """
    if unit not in ("day", "week", "month"):
        raise ValueError("unit must be day|week|month")
    period = F.date_trunc(unit, F.col(ts_col)).cast("date")
    act = df.select(F.col(user_col).alias("user"), period.alias("period"))
    act = act.withColumn("cohort", F.min("period").over(Window.partitionBy("user")))
    if unit == "day":
        offset = F.datediff("period", "cohort")
    elif unit == "week":
        offset = (F.datediff("period", "cohort") / 7).cast("int")
    else:
        offset = (
            (F.year("period") - F.year("cohort")) * 12
            + (F.month("period") - F.month("cohort"))
        )
    cells = (
        act.withColumn("offset", offset)
        .where(F.lit(True) if max_offset is None else (F.col("offset") <= max_offset))
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("user").alias("n_users"))
    )
    base = Window.partitionBy("cohort")
    return cells.withColumn(
        "retention",
        dratio(
            F.col("n_users"),
            F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(base),
            6,
        ),
    )


def time_to_convert(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: str | None = None,
) -> DataFrame:
    """Per-user conversion latency: for users who completed the WHOLE
    funnel, the integer seconds from step 1 to the final step.

    Pure projection over :func:`funnel_steps` — the latency metric costs
    the same single shuffle as the funnel itself. The delta is computed
    micros-first ((unix_micros(last) - unix_micros(first)) div 10^6), so
    both engines truncate identically regardless of sub-second stamps."""
    per = funnel_steps(df, user_col, ts_col, type_col, steps, max_span)
    first, last = "step1_ts", f"step{len(steps)}_ts"
    return per.where(F.col(last).isNotNull()).select(
        user_col,
        F.col(first).alias("first_ts"),
        F.col(last).alias("converted_ts"),
        F.expr(
            f"(unix_micros({last}) - unix_micros({first})) div 1000000"
        ).alias("delta_sec"),
    )
