"""Stream-static realization of the control pattern (SURVEY §2.3 J3).

The reference's Kafka-Streams variant reads control from a state store the
control stream maintains (KafkaTemperatureController.scala:57-67); its
Spark-v2 variant snapshots a driver map into the query closure and RESTARTS
the query on every control change (SparkStructuredStateController.scala:43-46,
82-110 — the banned J5 anti-pattern). The idiomatic Spark form when control
changes are slow (the reference's cadence is one setpoint per 10 minutes,
Heater.scala:74): keep control in a TABLE and stream-static join.

Structured Streaming re-executes the static side's plan every micro-batch,
so a table whose snapshot resolution happens at execution (Delta/Iceberg, or
any path whose files are atomically swapped) is picked up without restarting
the query — the control stream becomes a normal table-maintenance writer.
Against plain immutable parquet the join is still correct, just frozen at
the listing. The static side aggregates to latest-setting-per-key and
broadcasts (dimension-sized by definition: one row per sensor).

Scope: this form yields the hysteresis ACTION per reading. Emit-on-change
suppression (G6) is inherently stateful — chain `controller_streaming`'s
keyed state (or the batch `lag()` twin) downstream; a stateless join cannot
remember the last emitted command across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.controller import (
    hysteresis_action,
)


def latest_control_table(control: DataFrame) -> DataFrame:
    """Collapse a control-change log to latest-setting-per-sensor: max_by on
    the change sequence (one aggregation, no window sort)."""
    return control.groupBy("sensor_id").agg(
        F.max_by("desired", "seq").alias("desired"),
        F.max_by("up_delta", "seq").alias("up_delta"),
        F.max_by("down_delta", "seq").alias("down_delta"),
    )


def controller_stream_static(
    spark: SparkSession, sensor_stream: DataFrame, control_path: str
) -> DataFrame:
    """Sensor stream × static control table → (sensor_id, temperature, action,
    seq). Readings with no control row yet are dropped (inner join) — the
    reference's guard (SparkStructuredController.scala:105). action ∈ {0,1};
    in-band readings (-1) are filtered here, matching P4."""
    control = latest_control_table(spark.read.parquet(control_path))
    joined = sensor_stream.join(F.broadcast(control), "sensor_id")
    act = hysteresis_action(
        F.col("temperature"), F.col("desired"), F.col("up_delta"), F.col("down_delta")
    )
    return (
        joined.withColumn("action", act)
        .where(F.col("action") >= 0)
        .select("sensor_id", "temperature", F.col("action").alias("command"), "seq")
    )
