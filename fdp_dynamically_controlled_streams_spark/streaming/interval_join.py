"""Watermarked stream-stream interval join.

The reference never joins two streams relationally — its only combination is
union + keyed state (SURVEY §2.3 J1-J5). The engine extension for "pair
events from two live streams within a time band" is Structured Streaming's
stream-stream join: equi-key plus a time-range predicate, with watermarks on
BOTH sides so the join state is provably bounded.

Why the range condition matters at scale: with only an equi-condition Spark
must keep every past row of both streams in state forever (any future row
might match). Watermark + time bound lets the state store evict a buffered
row as soon as the other side's watermark passes its band — state size
becomes O(rate × band), independent of stream age. That eviction is exactly
what `tests/test_interval_join.py` asserts via the progress listener.

Batch twin: operators/asof.py::range_join — same semantics on static frames
(the oracle the catalog entry replays against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower,
    upper,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with equal ``on`` key and ``right_time`` within
    ``[left_time + lower, left_time + upper]``; both sides watermarked by
    ``watermark`` (e.g. ``"10 minutes"``). ``lower``/``upper`` are Column
    interval expressions (e.g. ``F.expr("INTERVAL 1 HOUR")``) or literals
    addable to a timestamp. Output columns are prefixed ``l_``/``r_`` to
    keep both sides addressable."""
    l = left.withWatermark(left_time, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(right_time, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    lt, rt = F.col(f"l_{left_time}"), F.col(f"r_{right_time}")
    cond = (
        (F.col(f"l_{on}") == F.col(f"r_{on}"))
        & (rt >= lt + lower)
        & (rt <= lt + upper)
    )
    return l.join(r, cond, how)
