"""Multi-resolution time rollups: every granularity from one scan.

A telemetry store at 100 TB serves dashboards at hour/day/month resolution;
recomputing each level from raw is N scans, and chaining level-over-level
(hour → day → month) adds pipeline stages and breaks for non-summable
aggregates. This operator materializes ALL requested granularities in ONE
pass: truncate the event time once per level, aggregate over native
``GROUPING SETS`` (``DataFrame.groupingSets``, Spark 4) — Catalyst's Expand
fans each input row out once per level, partial aggregation combines
map-side, and a single shuffle sized by OUTPUT cardinality (number of
buckets, tiny) — not by input rows — finishes the job.

Which level produced a row is decided with ``GROUPING()`` — never by
null-testing the truncation columns, so rows whose event time is genuinely
NULL stay unambiguous (they aggregate into a null bucket at every grain).

Re-aggregability beyond sums/counts comes from pairing this with the
mergeable sketches in operators/sketches.py (KMV for distincts), not from
level-chaining.

The reference has no aggregation surface at all (SURVEY §2.7) — this is a
charter extension following the same declare-don't-schedule stance as the
rest of the engine.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: granularities portable across Spark and ANSI engines
UNITS = ("hour", "day", "week", "month", "quarter", "year")


def rollup_time_hierarchy(
    df: DataFrame,
    ts_col: str,
    levels: Sequence[str],
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Aggregate at every granularity in ``levels`` in one pass.

    Output: ``(grain, bucket_start, keys…, <agg aliases>…)`` — one row per
    (level, truncated bucket, key combination). ``aggs`` maps output alias →
    aggregate Column over ``df``'s columns.
    """
    bad = [lv for lv in levels if lv not in UNITS]
    if bad:
        raise ValueError(f"unsupported granularities {bad}; pick from {UNITS}")
    base = df
    for lv in levels:
        base = base.withColumn(f"__t_{lv}", F.date_trunc(lv, F.col(ts_col)))
    tcols = [f"__t_{lv}" for lv in levels]
    sets = [[t, *keys] for t in tcols]

    grain = F
    grain = F.when(F.grouping(tcols[0]) == 0, F.lit(levels[0]))
    bucket = F.when(F.grouping(tcols[0]) == 0, F.col(tcols[0]))
    for lv, t in zip(levels[1:], tcols[1:]):
        grain = grain.when(F.grouping(t) == 0, F.lit(lv))
        bucket = bucket.when(F.grouping(t) == 0, F.col(t))

    out = base.groupingSets(sets, *tcols, *keys).agg(
        grain.alias("grain"),
        bucket.alias("bucket_start"),
        *[c.alias(name) for name, c in aggs.items()],
    )
    return out.select("grain", "bucket_start", *keys, *aggs.keys())
