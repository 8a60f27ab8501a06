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


# ---------------------------------------------------------------- triangles

from fdp_dynamically_controlled_streams_spark.operators.graph import triangles


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r.node: (r.deg, r.n_triangles, r.clustering_coeff)
        for r in triangles(df).collect()
    }


def test_k4_every_node_in_three_triangles(spark):
    # complete graph on 4 nodes: C(3,2)=3 triangles per node, coeff 1.0
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {i: (3, 3, 1.0) for i in range(4)}


def test_path_and_star_have_no_triangles(spark):
    got = _tri(spark, [(1, 2), (2, 3), (3, 4), (0, 9), (0, 8), (0, 7)])
    assert all(t == 0 for (_, t, _) in got.values())
    assert all(c == 0.0 for (_, _, c) in got.values())


def test_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle,
    # coeff 2*1/(3*2) = 1/3
    got = _tri(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, round(1 / 3, 6))
    assert got[4] == (1, 0, 0.0)


def test_duplicate_and_reversed_edges_collapse(spark):
    # same triangle listed with dupes / both orientations / self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)]
    got = _tri(spark, edges)
    assert got[1] == (2, 1, 1.0) and got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)


def test_triangles_partition_invariance(spark):
    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    a = _tri(spark, edges)
    df = spark.createDataFrame(edges, "u long, v long").repartition(17)
    b = {
        r.node: (r.deg, r.n_triangles, r.clustering_coeff)
        for r in triangles(df).collect()
    }
    assert a == b
