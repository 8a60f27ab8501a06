"""Frequent-itemset mining (market-basket co-occurrence) for curation
pipelines.

The reference has no mining surface (SURVEY.md §2.7); this is an engine
extension in the same family as the dedup/graph operators: find item pairs
that co-occur in many baskets — "parts ordered together", "documents cited
together", "tokens co-occurring in a window". The classic scale hazards and
their mitigations:

  * **Pair explosion.** A basket of n items yields n·(n-1)/2 pairs; one
    pathological basket (a crawler session with 10⁵ items) emits 5·10⁹
    pairs. ``max_basket_size`` drops such baskets BEFORE pair generation —
    the standard a-priori-style guard (cap is a parameter, applied
    identically in the SQL oracle).
  * **Infrequent-item pruning (a-priori).** A pair can only reach support s
    if both items individually reach s. ``prune_items=True`` semi-joins the
    basket-item table against the frequent-item set first — on skewed real
    corpora this removes the long tail before the quadratic step. The
    frequent-item set is support-filtered and therefore small → broadcast.
  * **Shuffle shape.** Pair generation is done per-basket from a sorted
    collected array (one shuffle on the basket key) with a JVM higher-order
    ``transform``/``flatten`` — NOT a self-join (two scans + the same
    shuffle) and never a cross join. The pair count is the second and last
    shuffle, on the (item_a, item_b) key.

Both shuffles are on keys with bounded fan-in (basket size ≤ cap; pair
support counts), so the plan survives a 1000-executor 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.exactround import dratio


def frequent_pairs(
    df: DataFrame,
    basket: str,
    item: str,
    min_support: int = 2,
    max_basket_size: int = 64,
    prune_items: bool = True,
) -> DataFrame:
    """Item pairs co-occurring in ≥ ``min_support`` distinct baskets.

    Returns columns ``item_a`` < ``item_b`` (basket-set semantics: duplicate
    (basket, item) rows count once) and ``n_baskets``.
    """
    items = df.select(F.col(basket).alias("bk"), F.col(item).alias("it"))
    return _pairs_of(items, min_support, max_basket_size, prune_items, False)


def _pairs_of(
    items: DataFrame,
    min_support: int,
    max_basket_size: int,
    prune_items: bool,
    distinct_input: bool,
) -> DataFrame:
    """Pair generation body shared by :func:`frequent_pairs` (raw
    (bk, it) input — collect_set dedups) and :func:`association_rules`
    (ONE materialized distinct (bk, it) relation serving all three
    consumers, so ``distinct_input=True`` skips the redundant distinct)."""
    if prune_items:
        freq_items = (
            (items if distinct_input else items.distinct())
            .groupBy("it")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= min_support)
            .select("it")
        )
        # support-filtered set: small by construction -> broadcast semi join
        items = items.join(F.broadcast(freq_items), "it", "left_semi")

    baskets = (
        items.groupBy("bk")
        .agg(F.sort_array(F.collect_set("it")).alias("its"))
        .where(F.size("its").between(2, max_basket_size))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(its, (x, i) -> "
                "transform(slice(its, i + 2, size(its)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b")
        )
        .agg(F.count("*").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket: str,
    item: str,
    min_support: int = 2,
    max_basket_size: int = 64,
) -> DataFrame:
    """Directed association rules A -> B from the frequent pairs: confidence
    = sup(AB)/sup(A), lift = sup(AB)·N / (sup(A)·sup(B)).

    Both metrics are a SINGLE IEEE division of exact integers (pair
    support, item supports, basket count), so they are bit-identical
    across engines. The basket total N is a one-row aggregate broadcast
    as a scalar cross join (the established single-row-scalar idiom); item
    supports join the (already support-filtered, hence bounded) rule set —
    at corpus scale these are two key-shuffles over the RULE table, whose
    size is bounded by the frequent-pair count, not the corpus.
    """
    # ONE materialization of the distinct basket-item relation serves all
    # three consumers below (basket total, item supports, pair generation)
    # — previously each consumer re-ran the scan + distinct shuffle (3-4
    # full passes; the same materialization-barrier cut as
    # text_local_min_fingerprints). Basket-item-sized, never corpus-text-
    # sized, so the localCheckpoint holds at scale.
    items = (
        df.select(F.col(basket).alias("bk"), F.col(item).alias("it"))
        .distinct()
        .localCheckpoint()
    )
    n_baskets = items.select("bk").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    sup = items.groupBy("it").agg(F.count(F.lit(1)).alias("sup"))
    pairs = _pairs_of(
        items, min_support, max_basket_size, True, True
    )
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_baskets",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_baskets",
        )
    )
    return (
        directed.join(sup.withColumnRenamed("it", "antecedent"), "antecedent")
        .withColumnRenamed("sup", "sup_a")
        .join(sup.withColumnRenamed("it", "consequent"), "consequent")
        .withColumnRenamed("sup", "sup_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("n_baskets").alias("n_both"),
            "sup_a",
            "sup_b",
            dratio(F.col("n_baskets"), F.col("sup_a"), 6).alias("confidence"),
            dratio(
                F.col("n_baskets").cast("decimal(38,0)") * F.col("n_total"),
                F.col("sup_a").cast("decimal(38,0)") * F.col("sup_b"),
                6,
            ).alias("lift"),
        )
    )
