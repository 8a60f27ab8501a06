"""Map-side parallelism floor for expensive Python-kernel boundaries.

A Parquet scan cannot split below a row group, so a table stored as a few
small files (the local testdata is ONE single-row-group file per table)
feeds a ``mapInPandas``/``mapInArrow`` kernel with fewer tasks than the
session has cores: the kernel's per-char / per-byte work serializes on one
thread while every other core idles. Measured on the rolling-hash window
kernel at sf0.1: 29.9 s single-task vs 4.7 s spread (identical output —
the kernels this is applied to are row-independent, and every downstream
aggregation is partitioning-invariant).

This is a GUARD, not a tuned constant: the floor is the session's
``defaultParallelism`` (cores locally, total executor cores on a cluster),
and the repartition only happens when the incoming plan has fewer
partitions.  At 100 TB a table scans as ~10^5-10^6 splits, the guard
compares 10^5 >= cores and the helper is a no-op — no extra shuffle is
ever paid at scale.  Locally it converts the degenerate one-row-group scan
into a cores-wide kernel stage for one narrow shuffle of the kernel's
input projection (guide: shuffle the lightweight proxy once so the
expensive per-task work parallelizes; stragglers leave the cluster idle
otherwise).

Apply ONLY in front of kernels whose per-row cost dwarfs one shuffle of
their input projection (rolling-hash windows, media codec encode/decode,
n x k distance matrices) — never blanket, and never to kernels that
require a key-clustered or sorted input (those repartition by key
already).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overlap_jobs(*thunks) -> None:
    """Run INDEPENDENT Spark actions concurrently from a small driver
    thread pool (guide §2.6 "overlap independent jobs"): Spark's
    scheduler runs several jobs at once inside one application, and
    actions are only sequential because driver code calls them
    sequentially — so a maintenance epoch's decisions write and its
    snapshot-relation writes (different output paths, no data
    dependency once the shared inputs are checkpointed) back-fill the
    executor slots each other's straggler tails leave idle, instead of
    paying their per-job tails end to end.  FIFO scheduling (the
    default) gives the earlier-submitted job priority, which is exactly
    the back-fill behaviour wanted.  Callers MUST only pass actions
    with no ordering dependency (epoch-addressed overwrite sinks keep
    re-delivery idempotent regardless of which write commits first).
    The first raised exception propagates after all threads finish."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        errs = []
        for f in futures:
            try:
                f.result()
            except Exception as exc:  # noqa: BLE001 — propagate after join
                errs.append(exc)
        if errs:
            raise errs[0]


def spread_for_kernel(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_parts`` (default: the
    session's ``defaultParallelism``) partitions iff it currently has
    fewer; streaming frames and already-wide plans pass through untouched.
    Row-to-partition assignment is deterministic under task retry (Spark
    sorts before round-robin repartition, SPARK-23207)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    want = min_parts if min_parts is not None else sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — conversion failure = leave plan alone
        return df
    if have >= want:
        return df
    return df.repartition(want)
