"""Laws for frequent-pair mining (operators/mining.py) and the snapshot-diff
entry's classification semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.mining import frequent_pairs


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_pairs_ordered_and_counts_exact(spark):
    # baskets: {1:ab, 2:ab, 3:abc, 4:c} -> ab:3, ac:1, bc:1
    data = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (3, "b"), (3, "c"), (4, "c")]
    df = spark.createDataFrame(data, ["bk", "it"])
    out = _rows(frequent_pairs(df, "bk", "it", min_support=1))
    assert out == {("a", "b", 3), ("a", "c", 1), ("b", "c", 1)}
    # every pair is emitted once, in sorted (item_a < item_b) order
    sup2 = _rows(frequent_pairs(df, "bk", "it", min_support=2))
    assert sup2 == {("a", "b", 3)}


def test_duplicate_basket_rows_count_once(spark):
    # set semantics: repeated (basket, item) lines must not inflate support
    data = [(1, "a"), (1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(data, ["bk", "it"])
    assert _rows(frequent_pairs(df, "bk", "it", min_support=1)) == {
        ("a", "b", 2)
    }


def test_basket_cap_drops_pathological_baskets(spark):
    # one 5-item basket over a cap of 4 contributes nothing; the small
    # basket still counts
    big = [(1, f"x{i}") for i in range(5)]
    small = [(2, "x0"), (2, "x1")]
    df = spark.createDataFrame(big + small, ["bk", "it"])
    out = _rows(
        frequent_pairs(df, "bk", "it", min_support=1, max_basket_size=4)
    )
    assert out == {("x0", "x1", 1)}


def test_prune_items_never_changes_the_answer(spark):
    # a-priori pruning is an optimization, not a semantics change
    data = [(b, f"i{(b * 7 + j) % 13}") for b in range(30) for j in range(4)]
    df = spark.createDataFrame(data, ["bk", "it"])
    on = _rows(frequent_pairs(df, "bk", "it", min_support=2, prune_items=True))
    off = _rows(
        frequent_pairs(df, "bk", "it", min_support=2, prune_items=False)
    )
    assert on == off and on


def test_partitioning_invariance(spark):
    data = [(b % 11, f"i{(b * 3) % 7}") for b in range(200)]
    df = spark.createDataFrame(data, ["bk", "it"])
    a = _rows(frequent_pairs(df, "bk", "it", min_support=2))
    b = _rows(frequent_pairs(df.repartition(13, "it"), "bk", "it", min_support=2))
    assert a == b


def test_snapshot_diff_applying_changes_reproduces_v2(spark):
    """Law: v1 patched by the diff classification == v2 exactly (the diff
    carries everything needed to roll a snapshot forward)."""
    from fdp_dynamically_controlled_streams_spark.queries import spark_queries

    sf = "/root/testdata/sf0.001"
    diff = spark_queries()["cdc_snapshot_diff"](spark, sf)
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("event_id", "CAST(value AS DOUBLE) AS value")
    )
    v1 = ev.where("event_id % 10 <> 3")
    v2 = ev.where("event_id % 10 <> 7").selectExpr(
        "event_id",
        "CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END AS value",
    )
    removed = diff.where("change_type = 'removed'").select("event_id")
    touched = diff.where("change_type IN ('added','updated')").select("event_id")
    patched = (
        v1.join(removed.union(touched), "event_id", "left_anti")
        .unionByName(v2.join(touched, "event_id", "left_semi"))
    )
    assert _rows(patched) == _rows(v2)
    # and the diff never emits an unchanged key
    unchanged = v1.join(v2, ["event_id", "value"], "left_semi").select("event_id")
    assert (
        diff.join(unchanged, "event_id", "left_semi").count() == 0
    )


def test_association_rules_metrics_exact(spark):
    # baskets: 1:ab 2:ab 3:ab 4:ac 5:a -> N=5, sup a=5 b=3 c=1; pair ab:3
    data = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
            (4, "a"), (4, "c"), (5, "a")]
    from fdp_dynamically_controlled_streams_spark.operators.mining import (
        association_rules,
    )

    df = spark.createDataFrame(data, ["bk", "it"])
    out = {
        (r.antecedent, r.consequent): (r.n_both, r.sup_a, r.sup_b,
                                       r.confidence, r.lift)
        for r in association_rules(df, "bk", "it", min_support=2).collect()
    }
    # a->b: conf 3/5, lift 3*5/(5*3)=1.0 ; b->a: conf 3/3=1, lift 1.0
    assert out == {
        ("a", "b"): (3, 5, 3, 0.6, 1.0),
        ("b", "a"): (3, 3, 5, 1.0, 1.0),
    }


def test_snapshot_diff_null_transitions_are_updates(spark):
    """NULL->value and value->NULL transitions between versions must
    classify as 'updated' (null-safe compare), and NULL==NULL as
    unchanged — the diff logic replicated on a hand-built frame."""
    from pyspark.sql import functions as F

    v1 = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, None), (4, 7.0)],
        "event_id bigint, value double",
    )
    v2 = spark.createDataFrame(
        [(1, 9.0), (2, None), (3, None), (4, 7.0)],
        "event_id bigint, value double",
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.event_id") == F.col("b.event_id"), "full_outer"
    )
    out = j.where(
        F.col("a.event_id").isNull()
        | F.col("b.event_id").isNull()
        | ~F.col("a.value").eqNullSafe(F.col("b.value"))
    ).select(
        F.coalesce(F.col("a.event_id"), F.col("b.event_id")).alias("event_id"),
        F.when(F.col("a.event_id").isNull(), F.lit("added"))
        .when(F.col("b.event_id").isNull(), F.lit("removed"))
        .otherwise(F.lit("updated"))
        .alias("change_type"),
    )
    got = {(r.event_id, r.change_type) for r in out.collect()}
    assert got == {(1, "updated"), (2, "updated")}


def test_loo_encoding_null_category_is_its_own_group(spark):
    """NULL categories must form their own LOO group (null-safe join), not
    vanish from the output."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None, 100), (2, None, 300), (3, "a", 500), (4, "a", 700)],
        "k bigint, cat string, cents bigint",
    )
    g = df.groupBy(F.col("cat").alias("_c")).agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    out = df.join(F.broadcast(g), df.cat.eqNullSafe(F.col("_c"))).select(
        "k",
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("cents")).cast("double") / (F.col("n") - 1),
        ).alias("loo"),
    )
    got = {r.k: r.loo for r in out.collect()}
    assert got == {1: 300.0, 2: 100.0, 3: 700.0, 4: 500.0}


def test_association_rules_match_bruteforce_hypothesis(spark):
    """Independent-formula cross-check (r7 verdict task 5): confidence and
    lift vs a plain-Python brute force that shares only the metric
    DEFINITIONS (conf = sup_ab/sup_a, lift = sup_ab*N/(sup_a*sup_b)),
    never the engine's expression tree. Hash parity vs the DuckDB twin
    proves portability of the shared shape; this proves the shape computes
    the right numbers. Engine rounds at 1e-6, so |engine - exact| <= 5e-7."""
    from collections import Counter
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fdp_dynamically_controlled_streams_spark.operators.mining import (
        association_rules,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 8)),
            min_size=2, max_size=60,
        ),
        support=st.integers(1, 3),
    )
    def run(rows, support):
        baskets: dict[int, set] = {}
        for bk, it in rows:
            baskets.setdefault(bk, set()).add(f"i{it}")
        n_total = len(baskets)
        sup = Counter()
        for its in baskets.values():
            sup.update(its)
        pair = Counter()
        for its in baskets.values():
            for a, b in combinations(sorted(its), 2):
                pair[(a, b)] += 1
        expected = {}
        for (a, b), n in pair.items():
            if n < support:
                continue
            for ant, cons in ((a, b), (b, a)):
                expected[(ant, cons)] = (
                    n,
                    sup[ant],
                    sup[cons],
                    n / sup[ant],
                    n * n_total / (sup[ant] * sup[cons]),
                )
        df = spark.createDataFrame(
            [(bk, f"i{it}") for bk, it in rows], ["bk", "it"]
        )
        got = {
            (r.antecedent, r.consequent): (
                r.n_both, r.sup_a, r.sup_b, r.confidence, r.lift
            )
            for r in association_rules(
                df, "bk", "it", min_support=support
            ).collect()
        }
        assert set(got) == set(expected)
        for key, (n, sa, sb, conf, lift) in expected.items():
            gn, gsa, gsb, gconf, glift = got[key]
            assert (gn, gsa, gsb) == (n, sa, sb)
            assert abs(gconf - conf) <= 5e-7
            assert abs(glift - lift) <= 5e-7

    run()


def test_frequent_pairs_matches_bruteforce_hypothesis(spark):
    """Property: on random basket tables, frequent_pairs equals a Python
    brute-force pair count under set semantics, for any support."""
    from collections import Counter
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 8)),
            min_size=1, max_size=60,
        ),
        support=st.integers(1, 3),
    )
    def run(rows, support):
        baskets = {}
        for bk, it in rows:
            baskets.setdefault(bk, set()).add(f"i{it}")
        expected = Counter()
        for its in baskets.values():
            for a, b in combinations(sorted(its), 2):
                expected[(a, b)] += 1
        expected = {
            (a, b, n) for (a, b), n in expected.items() if n >= support
        }
        df = spark.createDataFrame(
            [(bk, f"i{it}") for bk, it in rows], ["bk", "it"]
        )
        got = {
            tuple(r)
            for r in frequent_pairs(
                df, "bk", "it", min_support=support
            ).collect()
        }
        assert got == expected

    run()
