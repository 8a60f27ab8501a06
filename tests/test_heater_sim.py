"""Heater-simulator Python DataSource (sources/heater_sim.py): reference
closed-loop properties (SURVEY §2.6 H1-H4, §5.2 property list)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.sources import heater_sim as hsim


def _sim(spark, n_sensors=4, n_steps=240):
    hsim.register(spark)
    return (
        spark.read.format("heater_sim")
        .option("n_sensors", n_sensors)
        .option("n_steps", n_steps)
        .load()
    )


def test_shape_and_determinism(spark):
    df = _sim(spark)
    assert df.count() == 4 * 240
    assert df.rdd.getNumPartitions() == 4  # one partition per sensor (G5)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _sim(spark).collect()))
    assert a == b


def test_no_consecutive_equal_commands(spark):
    # Property (i): emit-on-change means no two consecutive equal commands.
    from pyspark.sql import Window

    df = _sim(spark).where(F.col("command").isNotNull())
    w = Window.partitionBy("sensor_id").orderBy("step")
    bad = df.select(
        (F.lag("command").over(w) == F.col("command")).alias("dup")
    ).where(F.col("dup"))
    assert bad.count() == 0


def test_temperature_oscillates_within_band(spark):
    # The closed loop converges: after the initial approach, temperature
    # stays within the hysteresis band around each sensor's setpoint
    # (reference correctness criterion, SURVEY §5.1 step 3).
    df = _sim(spark, n_sensors=3, n_steps=300)
    slope = hsim.HEAT_PER_STEP - hsim.COOL_PER_STEP
    stats = (
        df.where(F.col("step") > 100)
        .groupBy("sensor_id")
        .agg(F.min("temperature").alias("lo"), F.max("temperature").alias("hi"))
        .collect()
    )
    for r in stats:
        d = hsim.desired_for(r.sensor_id)
        assert r.lo >= d - hsim.DELTA - slope
        assert r.hi <= d + hsim.DELTA + slope


def test_heater_follows_command(spark):
    # H4: command On(0) -> heating, Off(1) -> cooling, starting that step.
    rows = (
        _sim(spark, n_sensors=1, n_steps=200)
        .where(F.col("command").isNotNull())
        .orderBy("step")
        .collect()
    )
    assert rows, "loop must emit commands"
    for r in rows:
        assert r.heater_on == (1 if r.command == 0 else 0)


def test_streaming_source_matches_batch(spark, tmp_path):
    # readStream over the sim must produce exactly the batch rows once all
    # steps are consumed — offsets are the step counter, regeneration is
    # deterministic, so replay == batch (S6/H2 parity, streaming form).
    hsim.register(spark)
    stream = (
        spark.readStream.format("heater_sim")
        .option("n_sensors", 2)
        .option("n_steps", 90)
        .option("steps_per_batch", 40)
        .load()
    )
    import time

    out: list = []
    # availableNow only consumes the single prefetched read() of a simple
    # stream reader; run on a continuous trigger and stop once the sim is
    # exhausted (read() returns empty batches past n_steps).
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: out.extend(map(tuple, bdf.collect())))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while len(out) < 2 * 90 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    batch = list(map(tuple, _sim(spark, n_sensors=2, n_steps=90).collect()))
    assert sorted(out) == sorted(batch)
    assert len(out) == 2 * 90
