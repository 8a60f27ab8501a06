"""Portable Bloom-filter join prefilter.

The classic shuffle-avoidance structure for selective joins at scale: build a
fixed-size bit table over the (distinct) keys of one side, broadcast it, and
drop probe-side rows whose keys cannot be members BEFORE the join shuffles
anything. Spark's own runtime filters (`spark.sql.optimizer.runtimeFilter.*`,
`bloom_filter_agg`) do this opaquely; this implementation is built from
portable pieces — the md5-derived 60-bit hash under k seeds, explicit
(word, mask) bit packing, `bit_or` aggregation — so the filter decision for
every key is bit-identical in ANSI SQL and the catalog entry can be
value-hash-gated (same policy as the KMV/HLL sketches: a structure is only
shipped if the oracle can replay it).

Layout: ``m_bits`` bit positions packed 32 per BIGINT word (shift stays far
from the sign bit in both engines); k seeded hashes per key. The built table
has m_bits/32 rows regardless of input size — kilobytes — and broadcasts;
membership never shuffles the probe side. No false negatives ever
(set-union build); false positives at the textbook (1-e^{-kn/m})^k rate,
surfaced exactly by the catalog entry's count comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: bit positions; packed 32 per 64-bit word so masks stay positive BIGINTs.
M_BITS = 1 << 16
WORD_BITS = 32
K_HASHES = 4
_SEED0 = 100  # hash seeds are _SEED0 .. _SEED0+k-1


def _positions(key, m_bits: int, k: int):
    return [portable_hash64(key, seed=_SEED0 + i) % m_bits for i in range(k)]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> DataFrame:
    """(word, bits) Bloom table over the distinct keys of ``df`` —
    m_bits/32 rows max, mergeable across shards by further bit_or."""
    pos = F.explode(
        F.array(*_positions(F.col("_k"), m_bits, k))
    ).alias("pos")
    return (
        df.select(F.col(key_col).cast("string").alias("_k")).distinct()
        .select(F.col("_k"), pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, pos % {WORD_BITS})").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Per distinct probe key: ``bloom_pass`` (all k bits set). The bloom
    table broadcasts; the probe side explodes k rows per key and reduces
    with bool_and — map-side work plus one keys-sized aggregation, never a
    shuffle of the full probe table against the build side."""
    pos = F.explode(
        F.array(*_positions(F.col("key"), m_bits, k))
    ).alias("pos")
    probed = (
        df.select(F.col(key_col).cast("string").alias("key")).distinct()
        .select("key", pos)
        .select(
            "key",
            (F.col("pos") / WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, pos % {WORD_BITS})").alias("mask"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "key",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).alias("hit"),
        )
    )
    return probed.groupBy("key").agg(F.expr("bool_and(hit)").alias("bloom_pass"))


def bloom_prefilter_sql(
    member_table: str,
    member_key: str,
    probe_table: str,
    probe_key: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> str:
    """DuckDB twin of build+probe+summary (identical hash family, packing,
    and aggregation), producing the catalog entry's one-row count summary."""
    member_pos = "\n  UNION ALL\n".join(
        f"  SELECT {portable_hash64_sql(f'CAST({member_key} AS VARCHAR)', seed=_SEED0 + i)}"
        f" % {m_bits} AS pos FROM (SELECT DISTINCT {member_key} FROM {member_table})"
        for i in range(k)
    )
    probe_pos = "\n  UNION ALL\n".join(
        f"  SELECT CAST({probe_key} AS VARCHAR) AS key,"
        f" {portable_hash64_sql(f'CAST({probe_key} AS VARCHAR)', seed=_SEED0 + i)}"
        f" % {m_bits} AS pos FROM (SELECT DISTINCT {probe_key} FROM {probe_table})"
        for i in range(k)
    )
    return f"""
WITH member_positions AS (
{member_pos}
), bloom AS (
  SELECT CAST(pos // {WORD_BITS} AS INT) AS word,
         bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INT)) AS bits
  FROM member_positions GROUP BY word
), probe_positions AS (
{probe_pos}
), probed AS (
  SELECT p.key,
         bool_and(coalesce(b.bits, 0) & (1::BIGINT << CAST(p.pos % {WORD_BITS} AS INT))
                  = (1::BIGINT << CAST(p.pos % {WORD_BITS} AS INT))) AS bloom_pass
  FROM probe_positions p
  LEFT JOIN bloom b ON b.word = CAST(p.pos // {WORD_BITS} AS INT)
  GROUP BY p.key
), exact AS (
  SELECT DISTINCT CAST({member_key} AS VARCHAR) AS key FROM {member_table}
)
SELECT count(*) AS n_probe_keys,
       count(*) FILTER (WHERE e.key IS NOT NULL) AS n_exact_members,
       count(*) FILTER (WHERE p.bloom_pass) AS n_bloom_pass,
       count(*) FILTER (WHERE p.bloom_pass AND e.key IS NULL) AS n_false_positive
FROM probed p LEFT JOIN exact e ON e.key = p.key
"""
