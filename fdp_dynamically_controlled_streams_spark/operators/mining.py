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

    if prune_items:
        freq_items = (
            items.distinct()
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
