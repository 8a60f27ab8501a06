"""Integer PageRank laws (the catalog entry proves engine parity; these
prove the operator behaves like PageRank)."""

from __future__ import annotations

from fdp_dynamically_controlled_streams_spark.operators.graph import (
    TOTAL_MASS,
    pagerank,
)


def _pr(spark, edges, n_iter=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r["rank"] for r in pagerank(df, n_iter=n_iter).collect()}


def test_star_hub_ranks_highest(spark):
    # 5 spokes all pointing at the hub: hub must dominate
    got = _pr(spark, [(i, 99) for i in range(5)])
    assert got[99] == max(got.values())
    assert got[99] > 3 * got[0]
    # spokes are symmetric
    assert len({got[i] for i in range(5)}) == 1


def test_dangling_mass_redistributes(spark):
    # A -> B, B dangling: B accumulates A's mass but leaks it back
    # uniformly, so both stay positive and B > A
    got = _pr(spark, [(1, 2)])
    assert got[2] > got[1] > 0


def test_mass_bounded_and_conserved_up_to_truncation(spark):
    edges = [(i, (i + 1) % 7) for i in range(7)]  # 7-cycle: no dangling
    got = _pr(spark, edges, n_iter=4)
    total = sum(got.values())
    # truncation only ever drops mass; a 7-cycle is symmetric so every
    # node keeps ~TOTAL/7
    assert total <= TOTAL_MASS
    assert total > TOTAL_MASS * 0.999
    assert len(set(got.values())) == 1


def test_partition_invariance(spark):
    edges = [(i, (i * 3 + 1) % 11) for i in range(11)] + [(0, 5), (7, 5)]
    a = _pr(spark, edges)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    b = {r.node: r["rank"] for r in pagerank(df).collect()}
    assert a == b
