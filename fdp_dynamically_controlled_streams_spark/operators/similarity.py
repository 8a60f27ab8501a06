"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Two tiers, same interface:
  * brute-force cosine top-k — the exact baseline. Probes broadcast against
    the corpus (probe set is small by construction), so the corpus never
    shuffles: scan → codegen'd cosine → per-probe top-k via window.
  * sign-LSH bucketed top-k — the 100 TB path: corpus bucketed once by
    sign-quantization of leading dimensions (functions.vectors.sign_bucket),
    probes join only their own bucket. Recall < 1.0 by design; bucket bits
    trade recall vs fan-out. An IVF refinement would replace the sign planes
    with k-means centroids (same join shape, centroids broadcast).

No Python in the hot path: cosine is zip_with/aggregate (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.vectors import cosine, sign_bucket


def brute_force_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe id (self excluded)."""
    probes = embeddings.where(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    corpus = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    scored = (
        F.broadcast(probes)
        .join(corpus, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("probe_id", "cand_id", "score", "rank")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's sign-LSH bucket.

    At scale the corpus side is written bucketed-by(bucket) so this join is
    shuffle-free on re-query; here the bucket expr is computed inline.
    """
    bucketed = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    probes = bucketed.where(F.col("cand_id").isin(probe_ids)).select(
        F.col("cand_id").alias("probe_id"),
        F.col("cand_vec").alias("probe_vec"),
        F.col("bucket").alias("probe_bucket"),
    )
    scored = (
        F.broadcast(probes)
        .join(
            bucketed,
            (F.col("probe_bucket") == F.col("bucket"))
            & (F.col("probe_id") != F.col("cand_id")),
        )
        .select(
            "probe_id",
            "cand_id",
            F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("probe_id", "cand_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (a < b) with cosine >= threshold, blocked by
    sign-LSH bucket so the self-join is within-bucket only."""
    bucketed = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
