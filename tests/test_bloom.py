"""Bloom prefilter laws: zero false negatives, shard mergeability, and the
broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.bloom import (
    bloom_build,
    bloom_probe,
)


def test_no_false_negatives(spark):
    """Every true member must pass — the law that makes a Bloom prefilter
    safe to put in front of a join."""
    members = spark.range(0, 2000).selectExpr("id AS k")
    bloom = bloom_build(members, "k", m_bits=1024, k=3)  # deliberately tiny
    out = bloom_probe(bloom, members, "k", m_bits=1024, k=3)
    assert out.where(~F.col("bloom_pass")).count() == 0


def test_nonmembers_mostly_rejected_at_sane_sizing(spark):
    members = spark.range(0, 500).selectExpr("id AS k")
    others = spark.range(1_000_000, 1_000_500).selectExpr("id AS k")
    bloom = bloom_build(members, "k")  # default 64 Kbit, k=4
    out = bloom_probe(bloom, others, "k")
    n_fp = out.where(F.col("bloom_pass")).count()
    assert n_fp < 50  # textbook rate at this fill is << 1%; 10% is a bug


def test_shard_union_merges(spark):
    """bit_or of per-shard blooms == bloom of the union — the property that
    lets the filter build as a distributed partial aggregate."""
    s1 = spark.range(0, 400).selectExpr("id AS k")
    s2 = spark.range(400, 800).selectExpr("id AS k")
    whole = {
        r.word: r.bits
        for r in bloom_build(s1.unionAll(s2), "k", m_bits=2048, k=3).collect()
    }
    b1 = bloom_build(s1, "k", m_bits=2048, k=3)
    b2 = bloom_build(s2, "k", m_bits=2048, k=3)
    merged = {
        r.word: r.bits
        for r in b1.unionAll(b2)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .collect()
    }
    assert merged == whole


def test_probe_plan_broadcasts_filter(spark):
    from fdp_dynamically_controlled_streams_spark.plans.audit import audit_plan

    members = spark.range(0, 1000).selectExpr("id AS k")
    probes = spark.range(0, 5000).selectExpr("id AS k")
    out = bloom_probe(bloom_build(members, "k"), probes, "k")
    a = audit_plan(out)
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert a.n_python_evals == 0
