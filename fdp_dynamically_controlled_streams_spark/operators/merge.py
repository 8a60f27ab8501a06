"""CDC merge: latest-wins upsert, delete handling, SCD2 history, upsert sink.

The reference's control stream IS a change-data-capture feed: the latest
``TemperatureControl`` per sensor is the materialized state the processor
reads (SURVEY §2.3 J3, §2.4 G2). This module is the batch/table form of that
maintenance — how a 100 TB pipeline keeps dimension/control snapshots current
without the banned restart-the-query pattern (SURVEY §3.2 J5):

* ``latest_by_key`` — collapse a change log to latest-row-per-key with ONE
  ``max_by(struct(row), struct(order))`` aggregation. Unlike the
  ``row_number() = 1`` idiom this does map-side partial aggregation, so the
  shuffle carries at most one row per key per input partition — the right
  shape when the log is 1000× the key space. (Struct-typed max_by plans as
  SortAggregate: a key-only sort per side of the exchange, vs the window
  idiom's full (key, order…) sort of the UN-shrunk shuffle.)
* ``merge_upsert`` — new snapshot = latest over (snapshot ∪ changes), change
  rows winning order ties. Deletes ride along as tombstone rows (``op_col``);
  a key whose winning row is a tombstone leaves the snapshot.
* ``scd2_history`` — interval form of the same log: per key, order by the
  change sequence, optionally suppress no-op changes (the batch twin of the
  controller's emit-on-change G6), then ``valid_from = seq``,
  ``valid_to = lead(seq)``, open interval = current.
* ``upsert_sink`` — streaming ``foreachBatch`` maintainer of a versioned
  parquet snapshot directory; batch-id-named versions make replays
  idempotent. (On a cluster with a transactional table format this becomes
  MERGE INTO; plain parquet keeps CI hermetic.)

Scale notes: every operator here shuffles once on the merge keys and nothing
else; no driver-side state, no collect. Snapshot rewrite cost is bounded by
snapshot size, not log size — compact the log into the snapshot on a cadence
(the streaming sink does it per micro-batch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Latest row per key, "latest" = max of ``order_by`` columns compared
    lexicographically (make the last one a unique id for determinism).
    Single aggregation — partial (map-side) combine, then one shuffle on
    ``keys``; no per-partition full sort like the window row_number idiom."""
    payload = [c for c in df.columns if c not in keys]
    ordk = F.struct(*[F.col(c) for c in order_by])
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ordk).alias("__row")
    )
    return agg.select(*keys, *[F.col("__row")[c].alias(c) for c in payload])


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "d",
) -> DataFrame:
    """Next snapshot = latest-wins merge of the current snapshot and a change
    batch. Both sides must carry ``order_by`` (the change sequence the
    snapshot last applied); change rows win exact order ties via a
    precedence column appended to the ordering. If ``op_col`` is given, rows
    whose winning value equals ``delete_op`` are tombstones: the key is
    dropped from the snapshot (and the column itself is kept, so the next
    merge can re-insert the key)."""
    prec = "__change_precedence"
    t = target.withColumn(prec, F.lit(0))
    c = changes.withColumn(prec, F.lit(1))
    merged = latest_by_key(
        t.unionByName(c), keys, [*order_by, prec]
    ).drop(prec)
    if op_col is not None:
        merged = merged.where(F.col(op_col) != delete_op)
    return merged


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    tracked: Sequence[str],
    tie_break: Sequence[str] = (),
    suppress_unchanged: bool = True,
) -> DataFrame:
    """Change log → type-2 slowly-changing-dimension intervals:
    (keys…, tracked…, valid_from, valid_to, is_current), where
    ``valid_from = seq`` of the change and ``valid_to`` = seq of the next
    change for that key (null = still current).

    ``suppress_unchanged`` drops a change whose tracked values equal the
    previous change's — emit-on-change (SURVEY §2.4 G6,
    SparkStructuredController.scala:109-113) applied to dimension history;
    without it every touch opens a new (degenerate) interval. Both window
    passes share one partitioning on ``keys`` — a single shuffle."""
    order = [F.col(seq_col), *[F.col(c) for c in tie_break]]
    w = Window.partitionBy(*keys).orderBy(*order)
    df = changes
    if suppress_unchanged:
        cur = F.struct(*[F.col(c) for c in tracked])
        # null-safe compare: nulls inside tracked columns must not 3VL-drop
        # the row, and the first change per key (prev = null) always stays
        df = (
            df.withColumn("__prev", F.lag(cur).over(w))
            .where(~cur.eqNullSafe(F.col("__prev")))
            .drop("__prev")
        )
    df = df.withColumn("valid_to", F.lead(F.col(seq_col)).over(w))
    return df.select(
        *keys,
        *tracked,
        F.col(seq_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def _snapshot_versions(spark: SparkSession, table_dir: str) -> list[int]:
    # directory listing via the JVM Hadoop FS (works for any supported scheme,
    # not just the local FS), tolerating a not-yet-created table dir
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def read_snapshot(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current snapshot = highest committed version dir, or None if empty."""
    versions = _snapshot_versions(spark, table_dir)
    if not versions:
        return None
    return spark.read.parquet(f"{table_dir}/v={versions[-1]}")


def upsert_sink(
    spark: SparkSession,
    table_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "d",
):
    """foreachBatch function maintaining ``table_dir`` as a versioned
    latest-wins snapshot of the change stream. Version dirs are named by
    batch id (``v=<batch_id>``), which makes the sink idempotent under
    micro-batch replay after failure: a version that already exists means
    the batch was fully applied — skip. The snapshot a batch merges into is
    the highest version BELOW its own batch id, so a replayed batch rebuilds
    exactly the state it would have produced the first time."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        versions = _snapshot_versions(spark, table_dir)
        if batch_id in versions:
            return  # replay of a committed batch: already applied
        prior = [v for v in versions if v < batch_id]
        base = (
            spark.read.parquet(f"{table_dir}/v={prior[-1]}")
            if prior
            else batch_df.sparkSession.createDataFrame([], batch_df.schema)
        )
        merged = merge_upsert(
            base, batch_df, keys, order_by, op_col=op_col, delete_op=delete_op
        )
        # parquet dir write is not atomic, but _SUCCESS-gated and versioned:
        # a torn write is re-done on replay because commit == dir complete
        merged.write.mode("overwrite").parquet(f"{table_dir}/v={batch_id}")

    return apply
