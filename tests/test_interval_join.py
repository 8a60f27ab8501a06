"""Stream-stream interval join: batch equivalence + bounded state.

Replay is in event-time order, so even a modest watermark loses no matches
(a row is never late); what the watermark DOES do is let the state store
evict buffered rows whose join band has passed — asserted here with the
progress listener: peak state rows stay well under total input rows.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.asof import range_join
from fdp_dynamically_controlled_streams_spark.sources.registry import (
    replay_dir,
    write_replay_chunks,
)
from fdp_dynamically_controlled_streams_spark.streaming.interval_join import (
    interval_join_streams,
)
from fdp_dynamically_controlled_streams_spark.streaming.monitor import (
    ProgressRecorder,
)

DDL = "user_id int, ts timestamp, amount double"
BAND = "INTERVAL 30 MINUTES"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dcs-ivj-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(side: int, hours: int = 6):
    # per user: one row every 20 min (left) / every 25 min shifted (right),
    # spread over `hours` hours so many watermark advances happen
    t0 = dt.datetime(2024, 3, 1)
    out = []
    step = 20 if side == 0 else 25
    for u in (1, 2, 3):
        t = t0 + dt.timedelta(minutes=7 * side + u)
        while t < t0 + dt.timedelta(hours=hours):
            out.append((u, t, float(u) + side))
            t += dt.timedelta(minutes=step)
    return out


def _write(rows, path, chunk_minutes=60):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "amount"]).sort_values("ts")
    pdf["user_id"] = pdf["user_id"].astype("int32")
    # micros, not pandas-default nanos: the engine session reads parquet
    # TIMESTAMP(NANOS) as long (schemas.py nanosAsLong), so a nanos file
    # would type-mismatch the declared timestamp column
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    t0 = pdf["ts"].min()
    chunks = [
        g.reset_index(drop=True)
        for _, g in pdf.groupby(
            ((pdf["ts"] - t0).dt.total_seconds() // (chunk_minutes * 60)).astype(int)
        )
    ]
    write_replay_chunks(chunks, path)


def _streaming_pairs(spark, tmp, watermark="30 minutes"):
    _write(_rows(0), f"{tmp}/left")
    _write(_rows(1), f"{tmp}/right")
    l = replay_dir(spark, f"{tmp}/left", DDL, files_per_trigger=1)
    r = replay_dir(spark, f"{tmp}/right", DDL, files_per_trigger=1)
    joined = interval_join_streams(
        l, r, "user_id", "ts", "ts", F.expr("INTERVAL 0 SECONDS"),
        F.expr(BAND), watermark,
    )
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    collected: list = []
    try:
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(lambda bdf, bid: collected.extend(bdf.collect()))
            .option("checkpointLocation", f"{tmp}/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.streams.removeListener(rec)
    pairs = sorted((x.l_user_id, x.l_ts, x.r_ts) for x in collected)
    peak_state = max((b.state_rows or 0) for b in rec.batches)
    return pairs, peak_state


def test_matches_equal_batch_range_join_and_state_is_bounded(spark, tmpdir):
    got, peak_state = _streaming_pairs(spark, tmpdir)

    left = spark.createDataFrame(_rows(0), DDL)
    right = spark.createDataFrame(_rows(1), DDL)
    batch = range_join(
        left, right, "user_id", "ts", "ts",
        F.expr("INTERVAL 0 SECONDS"), F.expr(BAND),
    )
    want = sorted(
        (x.u, x.lts, x.rts)
        for x in batch.select(
            F.col("l.user_id").alias("u"),
            F.col("l.ts").alias("lts"),
            F.col("r.ts").alias("rts"),
        ).collect()
    )
    assert got == want
    assert len(got) > 50  # the scenario actually joins plenty
    # bounded state: 6 h of data, 30 min band + 30 min watermark -> state
    # holds ~2 h of rows, far below the full input
    total_rows = len(_rows(0)) + len(_rows(1))
    assert 0 < peak_state < total_rows * 0.75
