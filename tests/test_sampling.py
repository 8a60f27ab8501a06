"""Deterministic sampling: reproducibility, stratification, split laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.sampling import (
    assign_split,
    bernoulli_sample,
    stratified_sample,
)


def _ids(spark, n=10_000):
    return spark.range(n).select(F.col("id"), (F.col("id") % 7).alias("grp"))


def test_bernoulli_rate_and_determinism(spark):
    df = _ids(spark)
    a = bernoulli_sample(df, "id", 0.2, seed=1)
    n = a.count()
    assert abs(n / 10_000 - 0.2) < 0.02  # hash-uniformity at n=10k
    # membership survives arbitrary repartitioning (df.sample would not)
    b = bernoulli_sample(df.repartition(17, "grp"), "id", 0.2, seed=1)
    assert sorted(r.id for r in a.collect()) == sorted(r.id for r in b.collect())
    # a different seed is an independent draw, not a shifted copy
    c = set(r.id for r in bernoulli_sample(df, "id", 0.2, seed=2).collect())
    overlap = len(c & set(r.id for r in a.collect()))
    assert abs(overlap / 10_000 - 0.04) < 0.02  # ≈ rate² under independence


def test_bernoulli_nesting(spark):
    # same seed: a 10% sample is a strict subset of the 30% sample
    # (gate < 1000 implies gate < 3000) — lets pipelines grow a sample
    # without invalidating work done on the smaller one.
    df = _ids(spark)
    small = set(r.id for r in bernoulli_sample(df, "id", 0.1, seed=5).collect())
    big = set(r.id for r in bernoulli_sample(df, "id", 0.3, seed=5).collect())
    assert small <= big


def test_stratified_rates(spark):
    df = _ids(spark)  # grp in 0..6, ~1429 rows each
    rates = {"0": 0.5, "1": 0.1}
    got = (
        stratified_sample(
            df.withColumn("grp", F.col("grp").cast("string")),
            "grp",
            "id",
            rates,
            default_rate=0.0,
            seed=3,
        )
        .groupBy("grp")
        .count()
        .collect()
    )
    by = {r.grp: r["count"] for r in got}
    assert set(by) == {"0", "1"}  # default 0 ⇒ other strata absent
    assert abs(by["0"] / 1429 - 0.5) < 0.06
    assert abs(by["1"] / 1429 - 0.1) < 0.06


def test_split_disjoint_exhaustive_stable(spark):
    df = _ids(spark)
    out = assign_split(df, "id", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=9)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 10_000  # exhaustive (every row labeled)
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["valid"] / 10_000 - 0.1) < 0.02
    # growing train 0.8 → 0.85 only reassigns rows INTO train
    grown = assign_split(df, "id", {"train": 0.85, "valid": 0.1, "test": 0.05}, seed=9)
    moved = (
        out.select("id", "split")
        .join(grown.select("id", F.col("split").alias("split2")), "id")
        .where("split = 'train' AND split2 != 'train'")
        .count()
    )
    assert moved == 0


# --- source-mixture rebalancing ---


def test_rebalance_down_samples_toward_targets(spark):
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sampling import (
        rebalance_mixture,
    )

    # 3 strata, deliberately unbalanced: a=600, b=300, c=100 of 1000
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 600, "a").when(F.col("id") < 900, "b").otherwise("c").alias("src"),
    )
    kept = rebalance_mixture(df, "src", "k", {"a": 0.2, "b": 0.3, "c": 0.5}, seed=4)
    counts = {r.src: r.n for r in kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # a: thr = 0.2*1000/600 -> ~333bp of 600 ≈ 200 expected (hash noise ±)
    assert 150 <= counts["a"] <= 250
    # b: thr = 0.3*1000/300 = 1.0 -> keep everything
    assert counts["b"] == 300
    # c under target (c share 0.1 < 0.5): keep everything, never up-sample
    assert counts["c"] == 100
    # determinism: same seed, same membership
    again = rebalance_mixture(df, "src", "k", {"a": 0.2, "b": 0.3, "c": 0.5}, seed=4)
    assert {r.k for r in kept.collect()} == {r.k for r in again.collect()}


def test_bottomk_fixed_size_merge_law(spark):
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sampling import (
        bottomk_sample,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    s = bottomk_sample(df, "k", k=50, seed=9)
    got = [r.k for r in s.orderBy("rank").collect()]
    assert len(got) == 50 and len(set(got)) == 50
    # merge law: bottom-k of shard bottom-ks == global bottom-k
    a = bottomk_sample(df.where(F.col("k") < 2500), "k", 50, seed=9)
    b = bottomk_sample(df.where(F.col("k") >= 2500), "k", 50, seed=9)
    merged = bottomk_sample(a.select("k").union(b.select("k")), "k", 50, seed=9)
    assert [r.k for r in merged.orderBy("rank").collect()] == got
    # plan shape: TakeOrderedAndProject, not a global Sort+Exchange
    assert "TakeOrderedAndProject" in s._jdf.queryExecution().executedPlan().toString()


def test_weighted_bottomk_laws(spark):
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sampling import (
        weighted_bottomk_sample,
    )

    # half the keys carry 20x the weight: they must dominate the sample
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 20.0).otherwise(1.0).alias("w"),
    )
    s = weighted_bottomk_sample(df, "k", "w", k=200, seed=3)
    got = s.orderBy("rank").collect()
    assert len(got) == 200 and len({r.k for r in got}) == 200
    heavy = sum(1 for r in got if r.k % 2 == 0)
    assert heavy > 150  # ~20:1 odds per draw; binomial tail makes <150 absurd
    # determinism + partition invariance
    again = weighted_bottomk_sample(df.repartition(17), "k", "w", 200, seed=3)
    assert [(r.k, r.rank) for r in again.orderBy("rank").collect()] == [
        (r.k, r.rank) for r in got
    ]
    # merge law: weighted bottom-k of shard bottom-ks == global
    a = weighted_bottomk_sample(df.where(F.col("k") < 2000), "k", "w", 200, seed=3)
    b = weighted_bottomk_sample(df.where(F.col("k") >= 2000), "k", "w", 200, seed=3)
    merged = weighted_bottomk_sample(
        a.select("k", "w").union(b.select("k", "w")), "k", "w", 200, seed=3
    )
    assert [r.k for r in merged.orderBy("rank").collect()] == [r.k for r in got]
    # zero/negative weights are excluded, not sampled or crashed on
    dfz = df.withColumn(
        "w", F.when(F.col("k") < 3999, F.lit(0.0)).otherwise(F.col("w"))
    )
    z = weighted_bottomk_sample(dfz, "k", "w", 200, seed=3).collect()
    assert [r.k for r in z] == [3999]
    # plan shape: TakeOrderedAndProject like the uniform tier
    assert "TakeOrderedAndProject" in s._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------ temperature mix


def test_temperature_mix_upsamples_low_resource_sources(spark):
    """Laws on a skewed corpus (α = 1/2 mixing): (1) accept RATES are
    monotone decreasing in source size (low-resource upsampled); (2) the
    realized mix is flatter than proportional — the small source's SHARE
    of the sample strictly exceeds its share of the corpus; (3) per-source
    thresholds reproduce the closed-form √n_s basis-point snap."""
    import math

    from fdp_dynamically_controlled_streams_spark.operators.sampling import (
        DENOM,
        temperature_mix,
    )

    sizes = {"big": 6000, "mid": 1500, "small": 200}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.source: r for r in temperature_mix(df, "source", "doc_id").collect()}
    assert set(got) == set(sizes)
    # (3) closed-form thresholds
    n_total = sum(sizes.values())
    total_w = 0.0
    for src in sorted(sizes):  # order-fixed fold, as the operator computes
        total_w += math.sqrt(sizes[src])
    t_budget = n_total // 5
    for src, n in sizes.items():
        rate = min(1.0, t_budget * math.sqrt(n) / (total_w * n))
        assert got[src].thr_bp == round(round(rate, 6) * DENOM), src
    # (1) monotone: smaller source -> higher accept rate
    assert got["small"].thr_bp > got["mid"].thr_bp > got["big"].thr_bp
    # (2) flatter than proportional
    n_sampled_total = sum(r.n_sampled for r in got.values())
    assert n_sampled_total > 0
    assert (got["small"].n_sampled / n_sampled_total) > (
        sizes["small"] / n_total
    )
