"""KMV distinct sketch: exactness below k, error bound above it."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.sketches import kmv_distinct


def test_kmv_exact_when_small(spark):
    # 3 groups with 10/40/63 distinct values — all below k=64 ⇒ exact.
    # (q = id div 3 is uniform per group; id % 63 would alias with g = id % 3)
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("g"), F.floor(F.col("id") / 3).alias("q")
    ).select(
        "g",
        F.when(F.col("g") == 0, F.col("q") % 10)
        .when(F.col("g") == 1, F.col("q") % 40)
        .otherwise(F.col("q") % 63)
        .alias("v"),
    )
    rows = {r.g: r for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    for g, true_n in [(0, 10), (1, 40), (2, 63)]:
        assert rows[g].n_exact == true_n
        assert rows[g].kmv_estimate == float(true_n)
        assert rows[g].rel_err == 0.0


def test_kmv_estimate_within_error_bound(spark):
    # one group, 50k distinct values; k=64 ⇒ stderr ≈ 1/sqrt(62) ≈ 12.7%.
    # assert within 4 sigma (~50%) to keep the test deterministic-safe,
    # and record that the realized error is what rel_err reports.
    df = spark.range(0, 50_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert r.n_exact == 50_000
    assert abs(r.kmv_estimate - 50_000) / 50_000 < 0.5
    assert r.rel_err == round(abs(r.kmv_estimate - 50_000) / 50_000, 6)


def test_kmv_duplicate_insensitive(spark):
    # 10x duplication of every value must not move the estimate
    base = spark.range(0, 5_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    dup = base.unionAll(base).unionAll(base)
    a = kmv_distinct(base, ["g"], "v", k=64).collect()[0]
    b = kmv_distinct(dup, ["g"], "v", k=64).collect()[0]
    assert (a.n_exact, a.kmv_estimate) == (b.n_exact, b.kmv_estimate)


def test_hll_estimate_within_error_bound(spark):
    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hll_distinct,
    )

    # 50k distinct; m=256 ⇒ stderr ≈ 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma.
    df = spark.range(0, 50_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    r = hll_distinct(df, ["g"], "v").collect()[0]
    assert r.n_exact == 50_000
    assert abs(r.hll_estimate - 50_000) / 50_000 < 0.26
    assert r.rel_err == round(abs(r.hll_estimate - 50_000) / 50_000, 6)


def test_hll_duplicate_insensitive_and_merge_equivalent(spark):
    """Registers are max-mergeable: the sketch of a union equals the sketch
    of the whole (here exercised via duplication — union of identical shards
    must not move the estimate)."""
    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hll_distinct,
    )

    base = spark.range(0, 20_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, ["g"], "v").collect()[0]
    b = hll_distinct(dup, ["g"], "v").collect()[0]
    assert (a.n_exact, a.hll_estimate) == (b.n_exact, b.hll_estimate)


def test_hll_shard_union_merges(spark):
    """Two disjoint shards unioned ≡ sketching the concatenated input — the
    distributed-merge law that makes the register table a safe partial."""
    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hll_distinct,
    )

    s1 = spark.range(0, 10_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    s2 = spark.range(10_000, 20_000).select(
        F.lit(0).alias("g"), F.col("id").alias("v")
    )
    whole = hll_distinct(s1.unionAll(s2), ["g"], "v").collect()[0]
    again = hll_distinct(s2.unionAll(s1), ["g"], "v").collect()[0]
    assert (whole.n_exact, whole.hll_estimate) == (again.n_exact, again.hll_estimate)


# --- count-min sketch laws ---


def test_cms_one_sided_error_for_all_values(spark):
    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    # zipf-ish: value v appears ~1000/(v+1) times, 200 distinct values
    df = spark.range(0, 200).selectExpr(
        "explode(sequence(1, cast(1000 / (id + 1) as int) + 1)) AS rep", "id AS v"
    )
    out = cms_heavy_hitters(df, "v", top=200).collect()
    assert len(out) == 200
    assert all(r.cms_estimate >= r.n_exact for r in out)  # never underestimates
    assert all(r.overestimate == r.cms_estimate - r.n_exact for r in out)


def test_cms_exact_when_wide_enough(spark):
    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    # 8 distinct values, w=256, d=4: a collision in ALL 4 rows is (8/256)^4
    # unlikely by construction with the fixed seeds -> estimates exact
    df = spark.range(0, 800).selectExpr("id % 8 AS v")
    out = cms_heavy_hitters(df, "v", top=8).collect()
    assert all(r.overestimate == 0 and r.n_exact == 100 for r in out)


def test_cms_counters_merge_by_sum(spark):
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        _cms_cells,
    )

    # sketch(shard A) + sketch(shard B) == sketch(A union B), counter-wise
    def counters(df):
        cells = df.select(
            F.posexplode(
                F.array(*_cms_cells(F.col("v").cast("string"), CMS_D, CMS_W))
            ).alias("r", "c")
        )
        return {
            (r.r, r.c): r.cnt
            for r in cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }

    a = spark.range(0, 300).selectExpr("id % 37 AS v")
    b = spark.range(300, 700).selectExpr("id % 53 AS v")
    ca, cb, cu = counters(a), counters(b), counters(a.union(b))
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cu


def test_hll_rollup_all_row_equals_flat_sketch(spark):
    """merge(day registers) == sketch(whole range): the ALL row of the
    rollup must carry the IDENTICAL estimate as a single flat HLL over the
    ungrouped values (max-merge is lossless)."""
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hll_distinct,
        hll_rollup,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 1311).alias("v"),
    )
    rolled = {
        r.g: (r.n_exact, r.hll_estimate)
        for r in hll_rollup(df, "g", "v").collect()
    }
    flat = hll_distinct(
        df.select(F.lit("ALL").alias("g"), "v"), ["g"], "v"
    ).collect()[0]
    assert rolled["ALL"] == (flat.n_exact, flat.hll_estimate)
    # every per-group row is present and exact counts are right
    assert set(rolled) == {str(i) for i in range(7)} | {"ALL"}
    assert rolled["ALL"][0] == 1311


def test_theta_overlap_exact_when_small(spark):
    # both sides under k distinct -> theta = 2^60 -> estimates ARE exact
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        kmv_overlap,
    )

    a = spark.range(0, 100).select(F.col("id").alias("v"))
    b = spark.range(60, 180).select(F.col("id").alias("v"))
    r = kmv_overlap(a, b, "v", k=256).collect()[0]
    assert r.n_exact_inter == 40 and r.inter_estimate == 40.0
    assert r.n_exact_union == 180 and r.union_estimate == 180.0
    assert r.rel_err_inter == 0.0 and r.rel_err_union == 0.0


def test_theta_overlap_estimates_within_bound(spark):
    # 10k vs 10k with 5k overlap at k=256: theta-sketch std error is
    # ~1/sqrt(k) ~ 6%; assert a generous 4-sigma 25% bound
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        kmv_overlap,
    )

    a = spark.range(0, 10_000).select(F.col("id").alias("v"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("v"))
    r = kmv_overlap(a, b, "v", k=256).collect()[0]
    assert r.n_exact_inter == 5_000 and r.n_exact_union == 15_000
    assert r.rel_err_inter < 0.25
    assert r.rel_err_union < 0.25


def test_theta_overlap_disjoint_sets(spark):
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        kmv_overlap,
    )

    a = spark.range(0, 5_000).select(F.col("id").alias("v"))
    b = spark.range(50_000, 55_000).select(F.col("id").alias("v"))
    r = kmv_overlap(a, b, "v", k=128).collect()[0]
    assert r.n_exact_inter == 0
    # one-sided: a disjoint pair may still sample a few collisions-below-
    # theta? no — hashes are distinct values, so the sampled intersection
    # is empty and the estimate must be exactly 0
    assert r.inter_estimate == 0.0
    assert r.rel_err_inter is None  # exact is 0 -> rel err undefined


# ---------------------------------------------------------------- HDR


def test_hdr_quantile_laws(spark):
    """Two laws of the log-linear quantile sketch on a skewed fixture:
    (1) the estimate NEVER exceeds the exact quantile (lower-bound
    selection), and relative error <= 2^-sub_bits (bucket width over
    lower bound); (2) ranks are exact rational ceils of q*n."""
    import math
    import random

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hdr_quantiles,
    )

    random.seed(3)
    vals = [round(math.exp(random.uniform(0, 10)) / 100 + 0.01, 2)
            for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "price double")
    got = {r.q: r for r in hdr_quantiles(df, "price").collect()}
    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    for q, num, den in [("p50", 1, 2), ("p90", 9, 10),
                        ("p99", 99, 100), ("p999", 999, 1000)]:
        rank = -(-num * n // den)  # ceil
        exact = cents[rank - 1]
        r = got[q]
        assert r.rank == rank, q
        assert r.estimate_cents <= exact, (q, r.estimate_cents, exact)
        assert exact - r.estimate_cents <= exact / 16 + 1, (
            q, r.estimate_cents, exact)


def test_hdr_sketch_merges_by_addition(spark):
    """Merge law: bucket counts from two halves ADD to the whole-corpus
    sketch, so quantiles computed from merged per-partition counts equal
    the single-pass answer exactly (the property that lets per-day
    sketches answer any coarser rollup without rescanning)."""
    import random

    from fdp_dynamically_controlled_streams_spark.operators.sketches import (
        hdr_quantiles,
    )

    random.seed(9)
    vals = [(i, round(random.uniform(0.5, 9000), 2)) for i in range(4000)]
    df = spark.createDataFrame(vals, "i long, price double")
    whole = sorted(map(tuple, hdr_quantiles(df, "price").collect()))
    halves = df.where(F.col("i") % 2 == 0).unionByName(
        df.where(F.col("i") % 2 == 1)
    )
    merged = sorted(map(tuple, hdr_quantiles(halves, "price").collect()))
    assert whole == merged
