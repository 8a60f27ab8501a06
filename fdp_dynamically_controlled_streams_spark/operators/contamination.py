"""Benchmark-contamination detection: flag training documents whose word
n-grams overlap an evaluation/benchmark set — the standard pre-training
hygiene pass (the reference engine has no notion of this; charter extension
for the LLM-data-pipeline tier, alongside dedup in SURVEY §2.7).

Scale shape (100 TB corpus, benchmark sets of 10^3-10^5 docs): the eval
side's distinct shingle-hash set is tiny and BROADCASTS; the training side
streams map-side through shingle construction (codegen'd row form,
functions/hashing.py shingle_rows) into one groupBy-on-doc shuffle. No
self-join, no corpus×corpus anything — cost is one pass over the corpus
plus a broadcast hash probe per shingle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    shingle_rows,
)


def contamination_report(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    flag_ratio: float = 0.5,
    broadcast_eval: bool | None = None,
    eval_broadcast_cap: int = 100_000,
) -> DataFrame:
    """Per TRAINING document: distinct n-gram shingle count, how many of
    those shingles also occur anywhere in the eval set (``eval_pred`` rows),
    the overlap ratio, and a contamination flag at ``flag_ratio``.

    Docs with fewer than ``shingle_n`` tokens produce no shingles and are
    absent from the report (nothing to overlap on) — same convention as the
    Jaccard dedup tier. Ratios use exact integer division at 1e-6 so the
    report value-hashes against a SQL oracle.

    The broadcast of eval ids / eval shingles assumes a BENCHMARK-sized eval
    side (≤ ~10^5 docs — the published-benchmark shape). ``broadcast_eval``:
    True forces broadcast, False forces shuffle joins (an eval side that is
    a large corpus slice would OOM the driver if broadcast), None counts the
    eval docs once and broadcasts iff ≤ ``eval_broadcast_cap``. Callers that
    know the shape should pass True/False to skip the gating count.
    """
    if broadcast_eval is None:
        broadcast_eval = (
            docs.where(eval_pred).limit(eval_broadcast_cap + 1).count()
            <= eval_broadcast_cap
        )
    bcast = F.broadcast if broadcast_eval else (lambda df: df)
    sh = shingle_rows(docs, id_col, text_col, shingle_n).select(
        "id", portable_hash64(F.col("s")).alias("h")
    )
    eval_ids = docs.where(eval_pred).select(F.col(id_col).alias("id"))
    # Distinct eval shingle hashes: benchmark-sized, broadcast explicitly.
    eval_sh = (
        sh.join(bcast(eval_ids), "id", "left_semi")
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_sh = sh.join(bcast(eval_ids), "id", "left_anti")
    probed = train_sh.join(bcast(eval_sh), "h", "left")
    return (
        probed.groupBy(F.col("id").alias(id_col))
        .agg(
            F.countDistinct("h").alias("n_shingles"),
            F.countDistinct(F.when(F.col("hit").isNotNull(), F.col("h"))).alias(
                "n_overlap"
            ),
        )
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            (F.expr("n_overlap * 1000000 div n_shingles") / F.lit(1000000.0)).alias(
                "overlap_ratio"
            ),
            (
                F.expr("n_overlap * 1000000 div n_shingles")
                >= F.lit(int(flag_ratio * 1000000))
            ).alias("contaminated"),
        )
    )
