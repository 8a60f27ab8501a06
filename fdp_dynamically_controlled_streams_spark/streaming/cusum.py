"""Streaming CUSUM change-point detection: the batch operator
(operators/changepoint.py) run as keyed state over a live stream — the
reference's keyed-stateful pattern (SURVEY §2.4 G1/G2, same runtime as
streaming/controller.py) applied to an analytics recurrence.

Exactness design — carry the PREFIX STATE, not the CUSUM value: state is
(P, M) where P is the running sum of (x − drift) since stream start and
M the running min of P. Within a batch both extend by sequential
left-to-right accumulation (np.cumsum / np.minimum.accumulate seeded with
the carried values), which is the *same float association* as a window
running sum, so S = P − min(0, M) is bit-identical to the batch closed
form — micro-batch boundaries cannot introduce drift, and the streaming
entry shares the batch entry's SQL oracle. (Carrying S itself instead
would re-associate the additions and break exact parity.)

State is two doubles per key — O(keys), trivially bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("p", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("cusum", T.DoubleType()),
        T.StructField("flagged", T.BooleanType()),
    ]
)


def _make_fn(drift: float, threshold: float):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        p0, m0 = state.get if state.exists else (0.0, float("inf"))
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # replay chunks preserve (ts, event_id) order ACROSS batches; the
        # shuffle may reorder within one, so restore it here
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        d = pdf["value"].to_numpy(dtype="float64") - drift
        # seeded sequential accumulation == window-frame association
        p = np.cumsum(np.concatenate(([p0], d)))[1:]
        m = np.minimum.accumulate(np.concatenate(([m0], p)))[1:]
        s = p - np.minimum(m, 0.0)
        state.update((float(p[-1]), float(m[-1])))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(pdf), uid, dtype="int64"),
                "ts": pdf["ts"],
                "event_id": pdf["event_id"].astype("int64"),
                "value": pdf["value"].astype("float64"),
                "cusum": s,
                # flag from the ROUNDED cusum — same rule as the batch
                # operator (changepoint.py): the raw float can straddle
                # the threshold across engines when S lands exactly on it
                "flagged": np.round(s, 6) > threshold,
            }
        )

    return fn


def cusum_streaming(
    events: DataFrame, drift: float, threshold: float
) -> DataFrame:
    """Keyed streaming CUSUM over (user_id, ts, event_id, value); emits
    every row with its running cusum and flag. `cusum` is emitted unrounded
    — round at the sink so both engines round the identical double. The
    FLAG, however, is already computed from the 1e-6-rounded value inside
    the stateful function (matching the batch operator), so consumers get
    the engine-stable flag without sink-side correction."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(drift, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
