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


def test_hotkey_stress_entry_spreads_and_bounds_reducer_share(spark):
    """The catalog's skewagg_hotkey_stress dataset (one key >= 50% of rows):
    phase-1 salting must spread the hot key across every salt bucket and
    bound any single reducer group's share of it to ~1/n_salts."""
    from fdp_dynamically_controlled_streams_spark.queries import _HOTKEY_EXPR_SQL
    from fdp_dynamically_controlled_streams_spark.schemas import load_table

    n_salts = 16
    ev = load_table(spark, "/root/testdata/sf0.001", "events").selectExpr(
        f"{_HOTKEY_EXPR_SQL} AS hot_key"
    )
    total = ev.count()
    hot_total = ev.where("hot_key = 0").count()
    assert hot_total >= total // 2  # the premise: one genuinely hot key

    groups = (
        with_salt(ev, n_salts)
        .groupBy("hot_key", "_salt")
        .count()
        .where("hot_key = 0")
        .collect()
    )
    assert len(groups) == n_salts  # hot key present in every salt bucket
    max_share = max(r["count"] for r in groups) / hot_total
    # Round-robin salt ⇒ near-perfect split; allow slack for partition seams.
    assert max_share <= 2.0 / n_salts, f"hot-key reducer share {max_share:.3f}"
