"""Integer PageRank laws (the catalog entry proves engine parity; these
prove the operator behaves like PageRank)."""

from __future__ import annotations

from fdp_dynamically_controlled_streams_spark.operators.graph import (
    TOTAL_MASS,
    pagerank,
)


def _pr(spark, edges, n_iter=3, sources=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r["rank"]
        for r in pagerank(df, n_iter=n_iter, sources=sources).collect()
    }


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


def test_pagerank_matches_numpy_power_iteration(spark):
    """Independent-formula cross-check (r7 verdict task 5): the integer
    fixed-point recurrence vs a numpy float power iteration that shares
    only the PageRank definition (damping 0.85, uniform teleport, uniform
    dangling redistribution), not the engine's integer expression tree.
    Tolerance is sized to integer truncation: each div drops < 1 unit of
    the 1e12 grid (relative ~1e-12/step), so 1e-6 absolute on the
    normalized ranks is orders of magnitude above the truncation floor
    while still catching any formula bug (a wrong damping split, a missed
    dangling term, or inflow normalized by the wrong degree all move
    ranks by >> 1e-6)."""
    import numpy as np

    from fdp_dynamically_controlled_streams_spark.operators.graph import (
        TOTAL_MASS,
    )

    # 53 nodes (TOTAL_MASS not divisible -> base truncation exercised),
    # pseudo-random out-edges, nodes 48..52 dangling-ish (dst-only)
    edges = [(i, (i * 7 + 3) % 53) for i in range(48)] + [
        (i, (i * 11 + 5) % 53) for i in range(0, 48, 3)
    ]
    edges = sorted(set(edges))
    n_iter = 3

    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        inflow = np.zeros(n)
        for u, v in edges:
            inflow[idx[v]] += r[idx[u]] / outdeg[u]
        dmass = sum(r[idx[u]] for u in nodes if u not in outdeg)
        r = 0.15 / n + 0.85 * (inflow + dmass / n)

    got = _pr(spark, edges, n_iter=n_iter)
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] / TOTAL_MASS - r[idx[v]]) < 1e-6, v


def test_no_driver_collect_in_iteration():
    # The r7 verdict's scale nit: the dangling-mass aggregate must be a
    # broadcast one-row scalar inside the update plan, not a per-round
    # driver collect. Pin the discipline at the source level, SCOPED TO
    # THE ITERATION LOOP BODY (r8 ADVICE: a whole-function substring
    # check flips on unrelated refactors — a docstring example, a
    # helper outside the loop). The only blocking per-round action is
    # the lineage-cutting localCheckpoint.
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(pagerank)))
    loops = [n for n in ast.walk(tree) if isinstance(n, ast.For)]
    assert loops, "pagerank lost its iteration loop?"
    body_src = "\n".join(ast.unparse(stmt) for stmt in loops[0].body)
    assert ".collect(" not in body_src
    assert "broadcast" in body_src  # dangling mass rides the scalar cross-join


def test_duplicate_seeds_normalize_to_set(spark):
    # r8 ADVICE: a duplicated seed id must not shrink the teleport share
    # (count-based denominators vs set-membership indicator).
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    a = _pr(spark, edges, sources=[1, 3])
    b = _pr(spark, edges, sources=[3, 1, 1, 3, 1])
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


# ---------------------------------------------------------------- bfs_hops

from fdp_dynamically_controlled_streams_spark.operators.graph import bfs_hops


def _bfs(spark, edges, seeds, max_hops=3):
    e = spark.createDataFrame(edges, "u long, v long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {r.node: r.hop for r in bfs_hops(e, s, max_hops=max_hops).collect()}


def test_bfs_path_graph_exact_hops(spark):
    # path 0-1-2-3-4-5, seed 0, 3 hops: nodes 0..3 at hops 0..3; 4,5 absent
    edges = [(i, i + 1) for i in range(5)]
    got = _bfs(spark, edges, [0], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_source_takes_min_hop(spark):
    # seeds at both ends of a 5-path: middle node is 2 from either end
    edges = [(i, i + 1) for i in range(4)]
    got = _bfs(spark, edges, [0, 4], max_hops=4)
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_unreachable_component_absent(spark):
    edges = [(0, 1), (10, 11)]
    got = _bfs(spark, edges, [0], max_hops=3)
    assert got == {0: 0, 1: 1}


def test_bfs_undirected_both_orientations(spark):
    # edge stored as (2, 1) still walks 1 -> 2
    got = _bfs(spark, [(2, 1)], [1], max_hops=1)
    assert got == {1: 0, 2: 1}


def test_bfs_seed_not_in_graph_kept_at_hop_zero(spark):
    got = _bfs(spark, [(0, 1)], [0, 42], max_hops=2)
    assert got == {0: 0, 42: 0, 1: 1}


def test_bfs_duplicate_edges_and_seeds_collapse(spark):
    got = _bfs(spark, [(0, 1), (0, 1), (1, 0)], [0, 0], max_hops=2)
    assert got == {0: 0, 1: 1}


def test_bfs_partition_invariance(spark):
    edges = [(i, (i * 5 + 2) % 17) for i in range(17)]
    a = _bfs(spark, edges, [0], max_hops=3)
    e = spark.createDataFrame(edges, "u long, v long").repartition(13)
    s = spark.createDataFrame([(0,)], "node long")
    b = {r.node: r.hop for r in bfs_hops(e, s, max_hops=3).collect()}
    assert a == b


def test_bfs_early_exit_matches_deep_cap(spark):
    # graph exhausts at hop 2; a much larger cap must not change output
    edges = [(0, 1), (1, 2)]
    assert _bfs(spark, edges, [0], max_hops=2) == _bfs(spark, edges, [0], max_hops=9)


def test_ppr_with_all_sources_equals_uniform_pagerank(spark):
    """Degeneracy law: personalized PageRank with sources = EVERY node is
    the uniform recurrence exactly (same teleport T//n, same dmass//n
    shares, same truncations) — pins that the indicator plumbing changes
    nothing when the indicator is all-ones."""
    edges = [(i, (i * 7 + 3) % 23) for i in range(20)] + [(2, 21), (21, 2)]
    nodes = sorted({u for e in edges for u in e})
    assert _pr(spark, edges, n_iter=3) == _pr(
        spark, edges, n_iter=3, sources=nodes
    )


def test_ppr_unreachable_nodes_get_zero(spark):
    """Locality law: a node that is not a seed and not reachable from any
    seed holds zero mass at every iteration; seeds hold positive mass."""
    # two disconnected components: {0,1,2} cycle and {10,11} edge
    edges = [(0, 1), (1, 2), (2, 0), (10, 11)]
    got = _pr(spark, edges, n_iter=3, sources=[0])
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    assert got[10] == 0 and got[11] == 0


# ---- weighted SSSP laws (entry proves engine parity; these prove the
# operator behaves like shortest path) ----


def _sssp(spark, edges, seeds, n_rounds=4):
    from fdp_dynamically_controlled_streams_spark.operators.graph import sssp

    e = spark.createDataFrame(edges, "u long, v long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {r.node: r.dist for r in sssp(e, s, n_rounds=n_rounds).collect()}


def test_sssp_cheap_detour_beats_expensive_direct(spark):
    # 1-3 direct costs 10; 1-2-3 costs 2+3=5: relaxation must take the detour
    got = _sssp(spark, [(1, 3, 10), (1, 2, 2), (2, 3, 3)], [1])
    assert got == {1: 0, 2: 2, 3: 5}


def test_sssp_unit_weights_reduce_to_bfs_hops(spark):
    from fdp_dynamically_controlled_streams_spark.operators.graph import bfs_hops

    edges = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (2, 5, 1), (5, 4, 1), (6, 7, 1)]
    got = _sssp(spark, edges, [1], n_rounds=3)
    e = spark.createDataFrame([(u, v) for u, v, _ in edges], "u long, v long")
    s = spark.createDataFrame([(1,)], "node long")
    hops = {r.node: r.hop for r in bfs_hops(e, s, max_hops=3).collect()}
    assert got == hops  # unit weights: cost == hop count, same reach bound


def test_sssp_more_rounds_never_worse_and_converges(spark):
    # expensive short path first, cheap long path needs more rounds
    edges = [(1, 5, 100), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)]
    r1 = _sssp(spark, edges, [1], n_rounds=1)
    r4 = _sssp(spark, edges, [1], n_rounds=4)
    assert r1[5] == 100 and r4[5] == 4  # later rounds improve the label
    for n, d in r4.items():
        assert d <= r1.get(n, d)  # monotone: never worse with more rounds
    assert _sssp(spark, edges, [1], n_rounds=5) == r4  # converged fixpoint


def test_sssp_multi_source_takes_nearest_seed_and_parallel_edge_min(spark):
    # parallel edges keep the cheapest; label = min over seeds
    edges = [(1, 2, 7), (1, 2, 3), (9, 2, 1)]
    got = _sssp(spark, edges, [1, 9])
    assert got == {1: 0, 9: 0, 2: 1}


def test_sssp_partition_invariant(spark):
    edges = [(i, i + 1, (i * 13) % 5 + 1) for i in range(1, 30)]
    e = spark.createDataFrame(edges, "u long, v long, w long")
    s = spark.createDataFrame([(1,), (17,)], "node long")
    from fdp_dynamically_controlled_streams_spark.operators.graph import sssp

    a = sorted(map(tuple, sssp(e.coalesce(1), s, n_rounds=4).collect()))
    b = sorted(map(tuple, sssp(e.repartition(16), s, n_rounds=4).collect()))
    assert a == b


# ---- k-core peeling laws ----


def _kcore(spark, edges, k=2, n_rounds=4):
    from fdp_dynamically_controlled_streams_spark.operators.graph import kcore

    e = spark.createDataFrame(edges, "u long, v long")
    return {r.node: r.deg for r in kcore(e, k=k, n_rounds=n_rounds).collect()}


def test_kcore_triangle_survives_star_dissolves(spark):
    # triangle = a 2-core; a star has no 2-core (spokes peel, then the hub)
    tri = [(1, 2), (2, 3), (1, 3)]
    star = [(10, i) for i in range(11, 16)]
    got = _kcore(spark, tri + star, k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_peels_inward(spark):
    # a path graph peels from the endpoints: one round removes both ends;
    # enough rounds dissolve it entirely under k=2
    chain = [(i, i + 1) for i in range(1, 6)]
    assert _kcore(spark, chain, k=2, n_rounds=5) == {}
    # but k=1 keeps everything with its degree
    got = _kcore(spark, chain, k=1, n_rounds=2)
    assert got == {1: 1, 2: 2, 3: 2, 4: 2, 5: 2, 6: 1}


def test_kcore_fixpoint_invariant_under_extra_rounds(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (2, 4)]
    a = _kcore(spark, edges, k=2, n_rounds=3)
    b = _kcore(spark, edges, k=2, n_rounds=6)
    assert a == b  # converged peel is a fixpoint


def test_kcore_lowcut_empty_edges(spark):
    # ADVICE r9: k="lowcut" on an empty edge set used to raise TypeError
    # (the control-scalar agg returns (null, null, 0)); the k-core of an
    # empty graph is empty at any k, so the guard returns it directly.
    from fdp_dynamically_controlled_streams_spark.operators.graph import kcore

    e = spark.createDataFrame([], "u long, v long")
    out = kcore(e, k="lowcut")
    assert out.columns == ["node", "deg"]
    assert out.count() == 0
    # self-loops-only degenerates to the same empty graph after canonicalize
    loops = spark.createDataFrame([(7, 7), (9, 9)], "u long, v long")
    assert kcore(loops, k="lowcut").count() == 0


def test_kcore_partition_invariant(spark):
    from fdp_dynamically_controlled_streams_spark.operators.graph import kcore

    edges = [(i, (i * 7) % 23) for i in range(1, 40)]
    e = spark.createDataFrame(edges, "u long, v long")
    a = sorted(map(tuple, kcore(e.coalesce(1), k=2).collect()))
    b = sorted(map(tuple, kcore(e.repartition(16), k=2).collect()))
    assert a == b


def test_sssp_matches_bruteforce_dijkstra_hypothesis(spark):
    """Independent-formula cross-check (the PageRank-vs-numpy class): the
    DataFrame relaxation pipeline must equal a plain-Python dict-based
    bounded Bellman-Ford (no frontier optimization, no joins, no Spark) on
    random small weighted graphs — agreement rules out a bug shared by
    the frontier/merge plumbing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fdp_dynamically_controlled_streams_spark.operators.graph import sssp

    def brute(edges, seeds, max_edges):
        # NB: Dijkstra under a hop cap is wrong (a cheaper path may use
        # more hops), hence plain synchronous relaxation over dicts.
        adj = {}
        for u, v, w in edges:
            if u != v:
                adj.setdefault(u, {})[v] = min(w, adj.get(u, {}).get(v, w))
                adj.setdefault(v, {})[u] = min(w, adj.get(v, {}).get(u, w))
        dist = {s: 0 for s in seeds}
        for _ in range(max_edges):
            nxt = dict(dist)
            for u, d in dist.items():
                for v, w in adj.get(u, {}).items():
                    if d + w < nxt.get(v, float("inf")):
                        nxt[v] = d + w
            dist = nxt
        return dist

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(0, 9), st.integers(0, 9), st.integers(1, 20)
            ),
            min_size=1,
            max_size=25,
        ),
        rounds=st.integers(1, 4),
    )
    def check(edges, rounds):
        seeds = [0, 5]
        got = _sssp(spark, edges, seeds, n_rounds=rounds)
        want = brute(edges, seeds, rounds)
        # brute keeps unreachable-only-via-self-loop seeds identically:
        # seeds are always present at 0 in both
        assert got == {k: v for k, v in want.items()}

    check()


def test_kcore_matches_bruteforce_peeling_hypothesis(spark):
    """Independent-formula cross-check for k-core: plain-Python set-based
    peeling (no DataFrames, no degree tables) must equal the semi-join
    pipeline on random small graphs for every k and round count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def brute(edges, k, rounds):
        live = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        for _ in range(rounds):
            deg = {}
            for a, b in live:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nxt = {(a, b) for a, b in live if a in keep and b in keep}
            if nxt == live:
                break
            live = nxt
        deg = {}
        for a, b in live:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return deg

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 11), st.integers(0, 11)),
            min_size=1,
            max_size=30,
        ),
        k=st.integers(1, 4),
        rounds=st.integers(1, 4),
    )
    def check(edges, k, rounds):
        got = _kcore(spark, edges, k=k, n_rounds=rounds)
        assert got == brute(edges, k, rounds)

    check()
