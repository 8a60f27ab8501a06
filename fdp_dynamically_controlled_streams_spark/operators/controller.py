"""The canonical "dynamically controlled streams" query — batch twin.

Reference semantics (sparkcontroller/.../SparkStructuredController.scala:96-118,
``controlTemperature``):

  per key sensorID, in arrival order:
    control record  -> state.setting := control (lastValue carried over, :100-103)
    sensor record   -> if state exists:
        action = 1  if temperature > desired + upDelta        (Off)
                 0  if temperature < desired - downDelta      (On)
                -1  otherwise (in band)                       (:107-108)
        emit (sensorID, action) iff action >= 0 AND action != state.lastValue
        then state.lastValue := action                        (:109-113)

Batch-twin derivation (why a window function is *exactly* equivalent):
after a candidate row (sensor record with state present and action >= 0) is
processed, ``lastValue == action`` whether or not it emitted — if it did not
emit, that is *because* ``action == lastValue`` already. Hence candidate k
emits iff ``action_k != action_{k-1}`` (first candidate always emits, since
initial lastValue = -1 and actions are in {0,1}). Emit-on-change is therefore
``lag(action) over (partition by key order by arrival)`` — no state loop
needed in batch. The streaming side (streaming/controller.py) implements the
same spec with real keyed state.

Ordering rule (SURVEY.md §4.2): the reference leans on undefined union order to
process control before data in a batch (SparkStructuredController.scala:69-70).
We make it explicit: order by (event_time | seq) with control records first on
ties — semantics in the plan, not in physical ordering luck.

Scale posture: one shuffle (the window partitionBy key); no driver collect; no
Python UDFs — entire plan is whole-stage-codegen'd column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Ties at one instant: control applies before data (SparkStructuredController.scala:69-70).
_CONTROL_FIRST = 0
_SENSOR_SECOND = 1


def unify_streams(control: DataFrame, sensor: DataFrame) -> DataFrame:
    """Tag + union the two streams into the UnifiedDataModel shape
    (DataModelTransform.scala:7, SparkStructuredController.scala:71).

    ``control``: sensor_id, desired, up_delta, down_delta, seq [, event_time]
    ``sensor``:  sensor_id, temperature, seq [, event_time]
    """
    c = control.select(
        "sensor_id",
        F.lit(_CONTROL_FIRST).alias("record_kind"),
        F.lit(None).cast("double").alias("temperature"),
        "desired",
        "up_delta",
        "down_delta",
        "seq",
    )
    s = sensor.select(
        "sensor_id",
        F.lit(_SENSOR_SECOND).alias("record_kind"),
        "temperature",
        F.lit(None).cast("double").alias("desired"),
        F.lit(None).cast("double").alias("up_delta"),
        F.lit(None).cast("double").alias("down_delta"),
        "seq",
    )
    return c.unionByName(s)


def hysteresis_action(temperature, desired, up_delta, down_delta):
    """G7 hysteresis-band predicate as a column expression
    (SparkStructuredController.scala:107-108): 1=Off, 0=On, -1=in-band."""
    return (
        F.when(temperature > desired + up_delta, F.lit(1))
        .when(temperature < desired - down_delta, F.lit(0))
        .otherwise(F.lit(-1))
    )


def controller_batch(control: DataFrame, sensor: DataFrame) -> DataFrame:
    """Batch twin of the full controller pipeline. Returns the emitted
    HeaterControl rows: (sensor_id, command, seq), in emission order per key.

    Pipeline: bad-record filter (P4: sensor_id >= 0,
    SparkStructuredController.scala:72) -> tag-union (J1) -> per-key
    latest-setting propagation (J3 semantics via last(ignorenulls)) ->
    hysteresis (G7) -> emit-on-change (G6 via lag).
    """
    unified = unify_streams(
        control.where(F.col("sensor_id") >= 0),
        sensor.where(F.col("sensor_id") >= 0),
    )

    w_order = ["seq", "record_kind"]
    w_state = (
        Window.partitionBy("sensor_id")
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Latest-value join: propagate the most recent control settings onto every row.
    with_setting = unified.select(
        "*",
        F.last("desired", ignorenulls=True).over(w_state).alias("cur_desired"),
        F.last("up_delta", ignorenulls=True).over(w_state).alias("cur_up"),
        F.last("down_delta", ignorenulls=True).over(w_state).alias("cur_down"),
    )

    candidates = with_setting.where(
        (F.col("record_kind") == _SENSOR_SECOND) & F.col("cur_desired").isNotNull()
    ).select(
        "sensor_id",
        "seq",
        hysteresis_action(
            F.col("temperature"), F.col("cur_desired"), F.col("cur_up"), F.col("cur_down")
        ).alias("action"),
    ).where(F.col("action") >= 0)

    w_emit = Window.partitionBy("sensor_id").orderBy("seq")
    return (
        candidates.select(
            "sensor_id",
            "seq",
            "action",
            F.lag("action").over(w_emit).alias("prev_action"),
        )
        .where(F.col("prev_action").isNull() | (F.col("prev_action") != F.col("action")))
        .select("sensor_id", F.col("action").alias("command"), "seq")
    )


def controller_batch_sql_oracle(control_sql: str, sensor_sql: str) -> str:
    """ANSI-SQL twin of :func:`controller_batch` for the DuckDB oracle.

    ``control_sql``/``sensor_sql`` are subqueries producing the two input
    shapes; column names must match unify_streams inputs.
    """
    return f"""
WITH control AS ({control_sql}),
     sensor AS ({sensor_sql}),
     unified AS (
       SELECT sensor_id, 0 AS record_kind, CAST(NULL AS DOUBLE) AS temperature,
              desired, up_delta, down_delta, seq
         FROM control WHERE sensor_id >= 0
       UNION ALL
       SELECT sensor_id, 1 AS record_kind, temperature,
              NULL, NULL, NULL, seq
         FROM sensor WHERE sensor_id >= 0
     ),
     with_setting AS (
       SELECT *,
              last_value(desired IGNORE NULLS) OVER w AS cur_desired,
              last_value(up_delta IGNORE NULLS) OVER w AS cur_up,
              last_value(down_delta IGNORE NULLS) OVER w AS cur_down
         FROM unified
       WINDOW w AS (PARTITION BY sensor_id ORDER BY seq, record_kind
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
     ),
     candidates AS (
       SELECT sensor_id, seq,
              CASE WHEN temperature > cur_desired + cur_up THEN 1
                   WHEN temperature < cur_desired - cur_down THEN 0
                   ELSE -1 END AS action
         FROM with_setting
        WHERE record_kind = 1 AND cur_desired IS NOT NULL
     ),
     emitted AS (
       SELECT sensor_id, seq, action,
              lag(action) OVER (PARTITION BY sensor_id ORDER BY seq) AS prev_action
         FROM candidates
        WHERE action >= 0
     )
SELECT sensor_id, action AS command, seq
  FROM emitted
 WHERE prev_action IS NULL OR prev_action != action
"""


def controller_from_bytes(control_bytes: DataFrame, sensor_bytes: DataFrame) -> DataFrame:
    """The reference's full pipeline from raw protobuf bytes
    (SparkStructuredController.scala:42-78): decode (P1) -> bad-record filter
    (P4, sentinel -1) -> tag-union (J1) -> stateful controller -> encoded
    HeaterControl bytes (K1 payload).

    Inputs carry (value binary, seq long) — the Kafka wire shape. Works on
    batch or streaming DataFrames (swap controller_batch for the streaming
    processor upstream when the inputs are streams).
    """
    from fdp_dynamically_controlled_streams_spark.functions.protowire import (
        decode_control_jvm,
        decode_control_udf,
        decode_sensor_jvm,
        decode_sensor_udf,
        encode_heater_control_udf,
    )

    # Preferred decode tier: JVM from_protobuf against the checked-in
    # FileDescriptorSet (codegen, prunable, no Python boundary). Falls back
    # to the Arrow-pandas wire codec when spark-protobuf is not on the
    # classpath — identical semantics including the -1 bad-record sentinel.
    control = decode_control_jvm(control_bytes)
    sensor = decode_sensor_jvm(sensor_bytes)
    if control is None or sensor is None:
        control = control_bytes.select(
            decode_control_udf("value").alias("d"), "seq"
        ).select("d.sensor_id", "d.desired", "d.up_delta", "d.down_delta", "seq")
        sensor = sensor_bytes.select(
            decode_sensor_udf("value").alias("d"), "seq"
        ).select("d.sensor_id", "d.temperature", "seq")
    out = controller_batch(control, sensor)  # applies the P4 filter itself
    return out.select(
        "sensor_id",
        "command",
        "seq",
        encode_heater_control_udf("sensor_id", "command").alias("value"),
    )


# ---------------------------------------------------------------------------
# Deriving controller inputs from the driver's `events` table (TESTDATA.md),
# so the oracle can check the controller on shared data: 'error' events act as
# control records (desired = value, deltas = 10.0), every other event type is
# a sensor reading (temperature = value); user_id is the sensor key.
# ---------------------------------------------------------------------------

EVENTS_CONTROL_SQL = (
    "SELECT CAST(user_id AS INT) AS sensor_id, value AS desired, "
    "10.0 AS up_delta, 10.0 AS down_delta, event_id AS seq "
    "FROM events WHERE event_type = 'error'"
)
EVENTS_SENSOR_SQL = (
    "SELECT CAST(user_id AS INT) AS sensor_id, value AS temperature, event_id AS seq "
    "FROM events WHERE event_type <> 'error'"
)


def controller_inputs_from_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    control = events.where(F.col("event_type") == "error").select(
        F.col("user_id").cast("int").alias("sensor_id"),
        F.col("value").alias("desired"),
        F.lit(10.0).alias("up_delta"),
        F.lit(10.0).alias("down_delta"),
        F.col("event_id").alias("seq"),
    )
    sensor = events.where(F.col("event_type") != "error").select(
        F.col("user_id").cast("int").alias("sensor_id"),
        F.col("value").alias("temperature"),
        F.col("event_id").alias("seq"),
    )
    return control, sensor
