"""SparkSession factory tuned for the engine's 100 TB design posture.

Defaults chosen for scale (AQE on, skew-join handling, Arrow batches) while
remaining correct on local[N] test runs. The reference's session setup
(SparkStructuredController.scala:27-31) is the ancestor: local master + Kryo +
checkpoint dir; we keep the shape but let every knob be overridden.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that define the engine's scale posture. On a real cluster the same
#: dict ships unchanged; only master/memory/executor counts differ.
ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-plan, partition coalescing, skew-join split.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast threshold: dims like region/nation/supplier must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scan sizing: at 100 TB this bounds per-task input; harmless locally.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Streaming state at large key spaces: RocksDB, not the in-memory HDFS store.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.shuffle.partitions": "32",
    # Testdata parquet carries TIMESTAMP(NANOS) which Spark has no native type
    # for; read as long and convert in schemas.load_table (micros truncation,
    # matching DuckDB's TIMESTAMP_NS -> TIMESTAMP behavior).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # Long-lived-session hygiene: the app-status store retains execution/job/
    # stage metadata even with the UI off (measured: ~1 GB driver heap after
    # ~280 catalog queries in one session). A bounded window keeps steady-
    # state heap flat on sessions that run thousands of queries.
    "spark.sql.ui.retainedExecutions": "50",
    "spark.ui.retainedJobs": "200",
    "spark.ui.retainedStages": "200",
    "spark.ui.retainedTasks": "5000",
}


def get_spark(
    app_name: str = "fdp-dcs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) — on a cluster, pass the real master or leave it to
    spark-submit by passing ``master=""``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
