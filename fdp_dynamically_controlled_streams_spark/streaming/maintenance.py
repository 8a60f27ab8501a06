"""The daily-crawl index-maintenance loop as a RESTART-SAFE Structured
Streaming pipeline (r12 verdict task 4).

The replay entries compose batch upserts day-by-day with DRIVER-memory
state (a dict holding the localCheckpointed index) — correct under the
hermetic availableNow replay, but a crashed driver loses the index and a
re-delivered micro-batch would double-apply.  This module is the
production form: **the streaming query's only state is the PERSISTED
index artifact**, written as one snapshot per micro-batch epoch, so the
pipeline survives exactly the two failure modes foreachBatch exposes:

* **restart** — a new run over the same checkpointLocation resumes with
  the batches Spark knows are uncommitted; the batch body reconstructs
  its screening index by reading the newest persisted snapshot with
  epoch < its batch id (seed if none), NOT from driver memory;
* **re-delivery** — foreachBatch is at-least-once per epoch; both writes
  (the day's decisions and the index snapshot) go to epoch-addressed
  directories with mode=overwrite, so re-running a batch rewrites the
  identical artifacts instead of appending duplicates (the
  merge.py::upsert_sink idempotence discipline applied to the stream).

Reference lineage: the reference keeps ALL its streaming state in the
engine checkpoint (SparkStructuredController.scala:30 `checkpointLocation`
— SURVEY §2.5 O4); this extends that discipline to a state object the
engine cannot checkpoint for us (a whole index table).

[ABSENT in reference: SURVEY §2.7 — engine extension.]
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators import dedup as dedup_ops


def _latest_snapshot(sig_root: str, before_epoch: int) -> str | None:
    """Newest COMMITTED index snapshot with epoch < ``before_epoch``.
    A snapshot is committed iff its parquet _SUCCESS marker exists — a
    crash mid-write leaves no marker and the snapshot is ignored, so a
    torn write can never be screened against."""
    best = None
    for p in glob.glob(os.path.join(sig_root, "e*")):
        name = os.path.basename(p)
        try:
            ep = int(name[1:])
        except ValueError:
            continue
        if ep < before_epoch and os.path.exists(os.path.join(p, "_SUCCESS")):
            if best is None or ep > best[0]:
                best = (ep, p)
    return best[1] if best else None


def minhash_maintenance_pipeline(
    spark: SparkSession,
    data_path: str,
    schema: str,
    seed_sig_path: str,
    work_dir: str,
    est_threshold: float = 0.3,
    files_per_trigger: int = 1,
    timeout_sec: int = 300,
) -> str:
    """Run the MinHash screen-then-upsert loop over the files in
    ``data_path`` (one micro-batch per ``files_per_trigger`` files) with
    persisted-artifact state under ``work_dir``:

    * ``work_dir/sig/e<epoch>/``  — index snapshot AFTER epoch's upsert
    * ``work_dir/out/e<epoch>/``  — epoch's decision rows
    * ``work_dir/chk``            — the streaming checkpoint

    Returns the decisions root (``work_dir/out``).  Calling it again
    with the same ``work_dir`` after more files appear in ``data_path``
    RESUMES: already-committed epochs are skipped by the streaming
    checkpoint, and new epochs screen against the newest persisted
    snapshot (law-tested in tests/test_streaming.py: an interrupted run
    + a resumed run produce exactly the one-shot run's decisions, and
    re-running a batch body is a no-op)."""
    from fdp_dynamically_controlled_streams_spark.sources.registry import (
        replay_dir,
    )

    sig_root = os.path.join(work_dir, "sig")
    out_root = os.path.join(work_dir, "out")
    os.makedirs(sig_root, exist_ok=True)

    def _proc(bdf: DataFrame, bid: int) -> None:
        bdf = bdf.localCheckpoint()
        prior = _latest_snapshot(sig_root, bid)
        sig_c = spark.read.parquet(prior if prior else seed_sig_path)
        sig_b = dedup_ops.minhash_signatures(bdf).localCheckpoint()
        dedup_ops.minhash_decisions_against_sigs(
            sig_b, sig_c, est_threshold=est_threshold
        ).write.mode("overwrite").parquet(os.path.join(out_root, f"e{bid}"))
        dedup_ops.minhash_index_upsert_sigs(
            sig_c, bdf.select(F.col("doc_id").alias("id")), sig_b
        ).write.mode("overwrite").parquet(os.path.join(sig_root, f"e{bid}"))

    stream = replay_dir(spark, data_path, schema, files_per_trigger)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(_proc)
        .option("checkpointLocation", os.path.join(work_dir, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return out_root


def embedding_maintenance_pipeline(
    spark: SparkSession,
    data_path: str,
    schema: str,
    seed_index_path: str,
    work_dir: str,
    threshold: float = 0.25,
    files_per_trigger: int = 1,
    timeout_sec: int = 300,
) -> str:
    """The EMBEDDING modality of the restart-safe loop — same persisted
    epoch-snapshot state discipline as
    :func:`minhash_maintenance_pipeline`, composed with the r13
    derived-parameter rule: each epoch re-derives the sign-LSH plane
    count from the CURRENT persisted index's size
    (similarity.derived_bits) and re-buckets the snapshot map-side
    before screening, so the durable pipeline carries the
    occupancy-pinned scale shape too.  Rebucketing unconditionally (one
    map-side projection over rows the epoch reads anyway) keeps the
    pipeline STATELESS beyond the snapshots themselves: no bits value
    to persist or reconcile on restart — the snapshot's own row count
    determines it, bit-identically on any replay."""
    from fdp_dynamically_controlled_streams_spark.operators import (
        similarity as sim_ops,
    )

    idx_root = os.path.join(work_dir, "idx")
    out_root = os.path.join(work_dir, "out")
    os.makedirs(idx_root, exist_ok=True)

    def _proc(bdf: DataFrame, bid: int) -> None:
        bdf = bdf.localCheckpoint()
        prior = _latest_snapshot(idx_root, bid)
        idx = spark.read.parquet(prior if prior else seed_index_path)
        bits = sim_ops.derived_bits(idx.count())
        idx = sim_ops.embedding_index_rebucket(idx, bits).localCheckpoint()
        sim_ops.embedding_decisions_against_index(
            bdf, idx, threshold=threshold, bits=bits
        ).write.mode("overwrite").parquet(os.path.join(out_root, f"e{bid}"))
        sim_ops.embedding_index_upsert(idx, bdf, bits=bits).write.mode(
            "overwrite"
        ).parquet(os.path.join(idx_root, f"e{bid}"))

    from fdp_dynamically_controlled_streams_spark.sources.registry import (
        replay_dir,
    )

    stream = replay_dir(spark, data_path, schema, files_per_trigger)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(_proc)
        .option("checkpointLocation", os.path.join(work_dir, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return out_root


def read_epoch_outputs(spark: SparkSession, out_root: str, ddl: str) -> DataFrame:
    """Union all committed epoch decision directories under ``out_root``
    (empty typed frame if none) — the read half of the epoch-addressed
    sink layout."""
    paths = sorted(
        p
        for p in glob.glob(os.path.join(out_root, "e*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    )
    if not paths:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*paths)
