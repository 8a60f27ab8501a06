"""Profiling and constraint operators: crafted frames with known defects."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.quality import (
    check_constraints,
    profile_table,
    split_by_constraints,
)


def _frame(spark):
    rows = [
        (1, 10.0, "ok"),
        (2, -5.0, "ok"),      # bad: negative
        (3, None, "ok"),      # bad: null value (rule must not pass via 3VL)
        (4, 20.0, None),      # bad: null tag
        (5, 30.0, "weird"),   # bad: tag outside domain
    ]
    return spark.createDataFrame(rows, "id long, val double, tag string")


RULES = lambda: {
    "val_positive": F.col("val") > 0,
    "tag_domain": F.col("tag").isin("ok", "meh"),
}


def test_profile_counts_and_extremes(spark):
    got = {r.column: r for r in profile_table(_frame(spark)).collect()}
    assert got["val"].n_nulls == 1
    assert got["val"].n_distinct == 4  # nulls not counted as distinct value
    assert (got["val"].min_num, got["val"].max_num) == (-5.0, 30.0)
    assert got["val"].min_str is None  # numeric column: _str pair empty
    assert got["tag"].n_nulls == 1
    assert (got["tag"].min_str, got["tag"].max_str) == ("ok", "weird")
    assert got["tag"].max_num is None


def test_check_constraints_counts_nulls_as_violations(spark):
    got = {r.rule: r for r in check_constraints(_frame(spark), RULES()).collect()}
    assert got["val_positive"].n_violations == 2  # -5.0 and NULL
    assert got["tag_domain"].n_violations == 2  # NULL and 'weird'
    assert got["val_positive"].n_rows == 5


def test_split_routes_rows_with_rule_names(spark):
    valid, bad = split_by_constraints(_frame(spark), RULES())
    v_ids = sorted(r.id for r in valid.collect())
    assert v_ids == [1]  # only row 1 passes both rules
    bad_map = {r.id: sorted(r.failed_rules) for r in bad.collect()}
    assert bad_map == {
        2: ["val_positive"],
        3: ["val_positive"],
        4: ["tag_domain"],
        5: ["tag_domain"],
    }
    # split preserves every row exactly once
    assert valid.count() + bad.count() == 5


def test_observe_constraints_piggybacks_on_the_writing_job(spark):
    from fdp_dynamically_controlled_streams_spark.operators.quality import (
        observe_constraints,
    )

    df, obs = observe_constraints(_frame(spark), RULES())
    # the metrics materialize with the frame's OWN action - no second scan
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 5
    assert got["val_positive"] == 2  # -5.0 and NULL
    assert got["tag_domain"] == 2  # NULL and 'weird'


def test_psi_drift_laws(spark):
    from fdp_dynamically_controlled_streams_spark.operators.quality import (
        psi_drift_report,
    )

    a = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    # identical distributions -> PSI ~ 0, not drifted
    same = psi_drift_report(a, a, "v", lo=0, hi=100, n_buckets=10).collect()
    assert len(same) == 10
    assert all(abs(r.psi_term) < 1e-9 for r in same)
    assert all(not r.drifted for r in same)
    # shifted distribution -> large PSI, drifted on every row
    b = spark.range(0, 1000).select(
        (50 + F.col("id") % 50).cast("double").alias("v")
    )
    diff = psi_drift_report(a, b, "v", lo=0, hi=100, n_buckets=10).collect()
    assert all(r.drifted for r in diff)
    assert diff[0].psi_total > 0.2
    # out-of-range values clamp into edge buckets instead of vanishing
    c = spark.range(0, 100).select((F.col("id") * 1000.0 - 5000).alias("v"))
    clamped = psi_drift_report(a, c, "v", lo=0, hi=100, n_buckets=10).collect()
    assert sum(r.cur_n for r in clamped) == 100
    edge = {r.bucket: r.cur_n for r in clamped}
    assert edge[0] + edge[9] == 100  # everything lands in the two edges


def test_k_anonymize_no_released_group_below_k(spark):
    from fdp_dynamically_controlled_streams_spark.operators.quality import (
        k_anonymize,
    )

    rows = [(i, ["a", "b", "c", "d"][min(i % 10, 3)], "x" if i % 2 else "y",
             float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, city string, sex string, v double")
    out = k_anonymize(df, ["city", "sex"], k=5)
    rel = out.collect()
    assert len(rel) == 40  # suppression redacts, never drops rows
    # law: every released (non-redacted) quasi-tuple has >= k rows
    from collections import Counter

    sizes = Counter((r.city, r.sex) for r in rel if not r.suppressed)
    assert all(n >= 5 for n in sizes.values())
    # redacted rows show '*' in ALL quasi columns, others untouched
    for r in rel:
        if r.suppressed:
            assert r.city == "*" and r.sex == "*"
        assert isinstance(r.v, float) and r.id is not None
    # some suppression actually happened in this scenario
    assert any(r.suppressed for r in rel) and any(not r.suppressed for r in rel)
    # NULL quasi-identifiers are still identifiable groups: a sub-k group
    # whose tuple contains NULL must be suppressed too (null-safe join),
    # not silently released
    nrows = [(100 + i, None, "z", 1.0) for i in range(3)] + [
        (200 + i, "big", "w", 1.0) for i in range(10)
    ]
    ndf = spark.createDataFrame(
        nrows, "id long, city string, sex string, v double"
    )
    nrel = k_anonymize(ndf, ["city", "sex"], k=5).collect()
    assert len(nrel) == 13
    null_group = [r for r in nrel if r.id >= 100 and r.id < 200]
    assert len(null_group) == 3 and all(r.suppressed for r in null_group)
    assert all(r.city == "*" and r.sex == "*" for r in null_group)
    big = [r for r in nrel if r.id >= 200]
    assert all(not r.suppressed and r.city == "big" for r in big)


# ------------------------------------------------------------ MAD outliers

from fdp_dynamically_controlled_streams_spark.operators.quality import mad_outliers


def test_mad_flags_obvious_outlier(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 1000])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r for r in mad_outliers(df, "event_type", "value", "event_id").collect()}
    assert out[5].is_outlier
    assert not any(out[i].is_outlier for i in range(5))
    # median of [10..14, 1000] = 12.5, MAD = median(|x-12.5|) = 1.5+... sanity:
    assert out[0].group_median == 12.5


def test_mad_zero_spread_flags_nothing(spark):
    rows = [(i, "b", 5.0) for i in range(6)] + [(9, "b", 9.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = mad_outliers(df, "event_type", "value", "event_id").collect()
    # >50% of the group at the median -> MAD 0 -> no outlier scale
    assert all(not r.is_outlier for r in out)
    assert all(r.robust_z == 0.0 for r in out)


def test_mad_partition_invariance(spark):
    rows = [(i, "t" + str(i % 3), float((i * 37) % 100)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    a = sorted(map(tuple, mad_outliers(df, "event_type", "value", "event_id").collect()))
    b = sorted(
        map(
            tuple,
            mad_outliers(
                df.repartition(7), "event_type", "value", "event_id"
            ).collect(),
        )
    )
    assert a == b


# ------------------------------------------------------------ l-diversity

from fdp_dynamically_controlled_streams_spark.operators.quality import (
    l_diversity_report,
)


def test_l_diversity_flags_constant_sensitive_group(spark):
    rows = [
        ("en", "web", 100),
        ("en", "web", 100),
        ("en", "web", 100),
        ("de", "web", 10),
        ("de", "web", 20),
        ("de", "web", 30),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, n_chars int")
    out = {(r.lang, r.source): r for r in l_diversity_report(df, ["lang", "source"], "n_chars", l_min=2).collect()}
    assert not out[("en", "web")].diverse  # constant sensitive value
    assert out[("en", "web")].n_distinct_sensitive == 1
    assert out[("de", "web")].diverse


def test_l_diversity_null_sensitive_not_counted(spark):
    rows = [("en", "web", None), ("en", "web", None), ("en", "web", 5)]
    df = spark.createDataFrame(rows, "lang string, source string, n_chars int")
    r = l_diversity_report(df, ["lang", "source"], "n_chars", l_min=2).collect()[0]
    assert r.n_rows == 3
    assert r.n_distinct_sensitive == 1
    assert not r.diverse
