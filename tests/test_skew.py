"""Salting rewrites: exact equivalence to unsalted plans on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.skew import (
    salted_join,
    salted_sum_count,
    with_salt,
)


def _skewed(spark):
    # key 0 holds 90% of rows (the hot key); keys 1-9 tiny
    hot = spark.range(0, 9000).selectExpr("0 AS k", "id AS v")
    cold = spark.range(0, 1000).selectExpr("CAST(id % 9 + 1 AS BIGINT) AS k", "id AS v")
    return hot.unionByName(cold)


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark), 8)
    per_salt = (
        df.where("k = 0").groupBy("_salt").count().collect()
    )
    assert len(per_salt) == 8  # hot key present in every salt bucket
    assert max(r["count"] for r in per_salt) < 9000  # no single-reducer funnel


def test_salted_sum_count_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r.k: (r.sum_value, r.n_rows)
        for r in salted_sum_count(df, ["k"], "v", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(0, 10).selectExpr("id AS k", "concat('dim', id) AS name")
    plain = sorted(
        (r.k, r.v, r.name) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(big, small, ["k"], n_salts=8).collect()
    )
    assert salted == plain and len(plain) == 10000
