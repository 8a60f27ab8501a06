"""Streaming EWMA: the batch per-key recurrence
(operators/timeseries.py::ewma) run as keyed state over a live stream —
same runtime and discipline as streaming/cusum.py.

Exactness design: EWMA's recurrence y_i = (1-α)·y_{i-1} + α·x_i is
INHERENTLY sequential (no re-associable prefix form survives double
precision — see the batch operator's overflow note), so carrying y itself
across micro-batches IS exact: the streaming run executes the identical
op sequence as the batch loop, just split at batch boundaries, and the
entry shares the batch entry's recursive-CTE oracle bit-for-bit.

State is one double per key (+ an implicit "seen" via state.exists) —
O(keys), trivially bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("y", T.DoubleType())])

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _make_fn(alpha: float):
    one_minus = 1.0 - alpha

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        started = state.exists
        prev = state.get[0] if started else 0.0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # replay chunks preserve (ts, event_id) order ACROSS batches; the
        # shuffle may reorder within one, so restore it here
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        x = pdf["value"].to_numpy(dtype="float64")
        y = np.empty_like(x)
        for i in range(len(x)):
            if not started and i == 0:
                prev = x[0]
                started = True
            else:
                prev = one_minus * prev + alpha * x[i]
            y[i] = prev
        state.update((float(prev),))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(pdf), uid, dtype="int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "value": x,
                "ewma": y,
            }
        )

    return fn


def ewma_streaming(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Keyed streaming EWMA over (user_id, ts, event_id, value); emits
    every row with its running smoothed value. `value`/`ewma` are emitted
    unrounded — round at the sink so both engines round the identical
    double (the repo's HALF_UP convention)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
