"""Heater-simulator Python DataSource: the reference's closed-loop device
sim (heater/.../Heater.scala:49-103, SURVEY §2.6 H1-H4) as a first-class
Spark 4 Python DataSource — `spark.read.format("heater_sim")`.

The reference runs the simulator as a standalone JVM publishing to Kafka
(H2) while a human watches the temperature oscillate (SURVEY §5.1). Here the
same physics ARE the source: each sensor is one InputPartition, so the
closed loop generates distributed (one task per sensor), deterministic, and
oracle-checkable — `queries.py::heater_sim_closed_loop` replays the exact
recurrence as a DuckDB recursive CTE and value-hash-compares.

Physics per step (reference constants, StreamsConfig.scala:14-16 /
Heater.scala:24-26,49-57): publish interval 10 s; heating slope
+interval/upRate = +10/60 °/step; cooling slope -interval/downRate =
-10/120 °/step; start 42.0. Controller (G6/G7): action = Off(1) above
desired+Δ, On(0) below desired-Δ; emit iff action differs from the last
emitted one; the heater follows the command (H4: command.index becomes the
heater operation — HeaterCommand numbering On=0/Off=1, messages.proto:6-9).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

HEAT_PER_STEP = 1.0 / 6.0  # +10s / 60s  (up rate 1 min)
COOL_PER_STEP = -1.0 / 12.0  # -10s / 120s (down rate 2 min)
START_TEMP = 42.0
DELTA = 1.0


def desired_for(sensor_id: int) -> float:
    """Per-sensor setpoint: deterministic spread around the reference's 45.0
    (Heater.scala:72-86 randomizes ±5; we pin the spread so the oracle can
    reproduce it)."""
    return 44.0 + sensor_id * 0.5


class HeaterSimReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_sensors = int(options.get("n_sensors", 8))
        self.n_steps = int(options.get("n_steps", 360))

    def partitions(self):
        # One partition per sensor: the key-space parallelism of the real
        # deployment (G5) applied to generation.
        return [InputPartition(i) for i in range(self.n_sensors)]

    def read(self, partition):
        sid = int(partition.value)
        desired = desired_for(sid)
        temp = START_TEMP
        # Deliberate deviation from Heater.scala:18 (which starts with
        # heaterOperation=1 = Off, cooling from 42.0 until the controller
        # commands On): starting hot-side-on reaches the hysteresis band in
        # fewer steps, like the pinned per-sensor setpoint spread above. The
        # DuckDB oracle (heater_sim_oracle_sql) replays this exact choice.
        heater_on = 1
        last_action = -1
        for step in range(1, self.n_steps + 1):
            temp += HEAT_PER_STEP if heater_on == 1 else COOL_PER_STEP
            if temp > desired + DELTA:
                raw = 1  # Off
            elif temp < desired - DELTA:
                raw = 0  # On
            else:
                raw = None
            cmd = raw if raw is not None and raw != last_action else None
            if cmd is not None:
                last_action = cmd
                heater_on = 1 if cmd == 0 else 0
            yield (sid, step, temp, heater_on, cmd)


class HeaterSimStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the simulator as a LIVE publisher (H2 — the reference
    emits one reading per 10 s per sensor; here each micro-batch advances
    ``steps_per_batch`` simulated steps). Offsets are the step counter, so
    replay-after-failure regenerates the identical rows (the recurrence is
    deterministic from step 0); state never lives in the source."""

    def __init__(self, options) -> None:
        self.n_sensors = int(options.get("n_sensors", 8))
        self.n_steps = int(options.get("n_steps", 360))
        self.steps_per_batch = int(options.get("steps_per_batch", 30))

    def initialOffset(self) -> dict:
        return {"step": 0}

    def _rows_between(self, lo: int, hi: int) -> list[tuple]:
        out = []
        for sid in range(self.n_sensors):
            desired = desired_for(sid)
            temp, heater_on, last_action = START_TEMP, 1, -1
            for step in range(1, hi + 1):
                temp += HEAT_PER_STEP if heater_on == 1 else COOL_PER_STEP
                raw = 1 if temp > desired + DELTA else (0 if temp < desired - DELTA else None)
                cmd = raw if raw is not None and raw != last_action else None
                if cmd is not None:
                    last_action = cmd
                    heater_on = 1 if cmd == 0 else 0
                if step > lo:
                    out.append((sid, step, temp, heater_on, cmd))
        return out

    def read(self, start: dict):
        lo = start["step"]
        hi = min(lo + self.steps_per_batch, self.n_steps)
        return iter(self._rows_between(lo, hi)), {"step": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_between(start["step"], end["step"]))


class HeaterSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "heater_sim"

    def schema(self) -> str:
        return (
            "sensor_id int, step int, temperature double, "
            "heater_on int, command int"
        )

    def reader(self, schema) -> HeaterSimReader:
        return HeaterSimReader(self.options)

    def simpleStreamReader(self, schema) -> HeaterSimStreamReader:
        return HeaterSimStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the heater_sim format. Only the
    already-registered collision is swallowed; anything else (e.g. a PySpark
    build without the Python DataSource API) propagates instead of surfacing
    later as a confusing DATA_SOURCE_NOT_FOUND."""
    try:
        spark.dataSource.register(HeaterSimDataSource)
    except Exception as exc:
        msg = str(exc)
        if "DATA_SOURCE_ALREADY_EXISTS" in msg or "already" in msg.lower():
            return
        raise


def heater_sim_oracle_sql(n_sensors: int, n_steps: int) -> str:
    """DuckDB recursive-CTE twin of the Python generator: the identical
    double recurrence (same adds in the same order -> bit-equal), the same
    hysteresis + emit-on-change + heater-follows-command loop."""
    # DuckDB parses bare 1.0/6.0 as DECIMAL division (scale-1 -> 0.2!);
    # every numeric below is pinned to DOUBLE, slopes as exact repr literals
    # so both engines add the identical doubles in the identical order.
    heat, cool = repr(HEAT_PER_STEP), repr(COOL_PER_STEP)
    return f"""
WITH RECURSIVE sim AS (
  SELECT CAST(s.sensor_id AS INT) AS sensor_id, 0 AS step,
         CAST(42.0 AS DOUBLE) AS temperature, 1 AS heater_on,
         -1 AS last_action, CAST(NULL AS INT) AS command,
         CAST(44.0 AS DOUBLE) + CAST(s.sensor_id AS DOUBLE) * CAST(0.5 AS DOUBLE) AS desired
    FROM (SELECT unnest(range({n_sensors})) AS sensor_id) s
  UNION ALL
  SELECT sensor_id, step + 1, t2,
         CASE WHEN cmd IS NOT NULL THEN (CASE WHEN cmd = 0 THEN 1 ELSE 0 END)
              ELSE heater_on END,
         CASE WHEN cmd IS NOT NULL THEN cmd ELSE last_action END,
         cmd, desired
    FROM (
      SELECT sensor_id, step, heater_on, last_action, desired, t2,
             CASE WHEN raw IS NOT NULL AND raw <> last_action THEN raw END AS cmd
        FROM (
          SELECT sensor_id, step, heater_on, last_action, desired, t2,
                 CASE WHEN t2 > desired + CAST(1.0 AS DOUBLE) THEN 1
                      WHEN t2 < desired - CAST(1.0 AS DOUBLE) THEN 0 END AS raw
            FROM (
              SELECT sensor_id, step, heater_on, last_action, desired,
                     temperature + CASE WHEN heater_on = 1
                                        THEN CAST({heat} AS DOUBLE)
                                        ELSE CAST({cool} AS DOUBLE) END AS t2
                FROM sim WHERE step < {n_steps}
            )
        )
    )
)
SELECT sensor_id, step, round(temperature, 6) AS temperature,
       heater_on, command
  FROM sim WHERE step >= 1
"""
