"""As-of (temporal latest-value) and range joins.

The reference's only join is a latest-value join realized with per-key state
(SURVEY.md §2.3 J1-J5). The batch generalization is the as-of join: for each
left row, attach the most recent right row at-or-before its timestamp, per key.

Spark-first strategy (no built-in ASOF in Spark SQL): tag + union both sides,
one window pass with ``last(ignorenulls)`` per key ordered by (time, side) —
exactly the same shape as the controller's latest-value propagation, so ONE
shuffle on the key, no O(n*m) theta-join blowup, and it scales linearly.
A broadcast-able right side could alternatively use a range join; this union
form is the 100 TB-safe default (right side may be huge too).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """For each left row: latest right payload with right_time <= left_time,
    matching on key ``on``. Right rows sort before left rows on time ties
    (the controller's control-before-data rule, SparkStructuredController.scala:69-70).

    ``tiebreak``: right-side columns ordering EXACT right-time ties — the
    GREATEST tiebreak wins ("latest" resolves to the extremum). Without it,
    two right rows sharing (key, time) leave the winner to partition-local
    sort order — nondeterministic across engines and partitionings (found
    by the full-catalog sf0.1 tier, round 10: same-customer same-date
    orders exist at sf0.1 but not sf0.01). Any caller whose right side can
    carry duplicate (key, time) pairs MUST pass one; choosing the payload
    itself makes the selected VALUE the tie-group maximum, total and
    engine-portable even when the tiebreak columns themselves tie.

    Returns all left columns plus ``payload`` columns (null when no match yet).
    """
    lcols = left.columns
    extra = [t for t in tiebreak if t not in payload]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        *[F.lit(None).cast(right.schema[t].dataType).alias(t) for t in extra],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__left"].dataType).alias("__left"),
        *payload,
        *extra,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).select(
        "__side",
        "__left",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return unioned.where(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols], *payload
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Forward (look-ahead) as-of: for each left row, the EARLIEST right
    payload with right_time >= left_time, per key — the mirror of
    :func:`asof_join` (pandas merge_asof direction='forward'): "what
    happened next". Same union + one-window-pass shape, one shuffle on the
    key; the frame looks FORWARD (currentRow..unboundedFollowing) with
    ``first(ignorenulls)``, and left rows sort before right rows on time
    ties so a simultaneous right row still matches.

    ``tiebreak``: right-side columns ordering EXACT right-time ties — the
    LEAST tiebreak wins here (the forward mirror of asof_join's
    greatest-wins). Required for determinism whenever the right side can
    carry duplicate (key, time) pairs; see :func:`asof_join`."""
    lcols = left.columns
    extra = [t for t in tiebreak if t not in payload]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*lcols).alias("__left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        *[F.lit(None).cast(right.schema[t].dataType).alias(t) for t in extra],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(l.schema["__left"].dataType).alias("__left"),
        *payload,
        *extra,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *tiebreak)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = r.unionByName(l).select(
        "__side",
        "__left",
        *[F.first(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return unioned.where(F.col("__side") == 0).select(
        *[F.col("__left")[c].alias(c) for c in lcols], *payload
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower,
    upper,
) -> DataFrame:
    """Pairs (l, r) with same key and right_time in [left_time+lower, left_time+upper].

    Equi-key + band condition: Catalyst executes the equi part as a hash/SMJ
    join and the band as a post-filter — shuffle on the key only. For keyless
    band joins, bucketize time into epochs first (not needed here).
    """
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    return left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}")) & (rt >= lt + lower) & (rt <= lt + upper),
    )
