"""Lloyd k-means: convergence/partition-invariance laws the oracle compare
alone can't establish (the catalog entry proves engine parity at fixed
iterations; these prove the operator behaves like k-means)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.clustering import (
    kmeans_assign,
)


def _emb(spark, n=60, dim=6, spread=5.0):
    # 3 well-separated blobs with deterministic jitter; ids 0..2 are one
    # member of each blob so the id<k init starts near distinct blobs
    rows = []
    for i in range(n):
        blob = i % 3
        vec = [
            spread * blob + 0.01 * ((i * 7 + d * 13) % 11)
            for d in range(dim)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_separated_blobs_recovered(spark):
    out = kmeans_assign(_emb(spark), k=3, n_iter=3).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, set()).add(r.vec_id % 3)
    # each recovered cell contains exactly one blob
    assert all(len(v) == 1 for v in by_cell.values())
    assert len(by_cell) == 3


def test_assignment_partition_invariant(spark):
    e = _emb(spark)
    a = sorted((r.vec_id, r.cell) for r in kmeans_assign(e, 3, 2).collect())
    b = sorted(
        (r.vec_id, r.cell)
        for r in kmeans_assign(e.repartition(13), 3, 2).collect()
    )
    assert a == b


def test_iterations_do_not_increase_inertia(spark):
    e = _emb(spark, spread=1.0)  # overlapping blobs: iterations matter
    inertia = [
        kmeans_assign(e, 3, it).agg(F.sum("dist")).collect()[0][0]
        for it in (1, 2, 3)
    ]
    assert inertia[0] >= inertia[1] >= inertia[2] - 1e-6


def test_empty_cell_keeps_previous_centroid(spark):
    # centroid 2 (id=2) sits far from every point incl. itself after one
    # update? Construct: ids 0,1 near origin, id 2 alone far away, rest
    # near origin -> cell 2 keeps exactly one member (itself); then move on:
    # the guard is exercised by a k larger than distinct clusters
    rows = [(i, [float(i % 2)] * 4) for i in range(10)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(e, k=3, n_iter=2).collect()
    # only 2 distinct points exist; k=3 must not crash and must cover all
    assert len(out) == 10
    assert {r.cell for r in out} <= {0, 1, 2}


def _emb_skewed_ids(spark, n=60, dim=6, spread=8.0):
    # adversarial for the id<k init: ids 0..2 all land in blob 0 (blob =
    # id // 20), so fixed-id seeding starts every center in one blob while
    # k-means++ must spread by D^2 weighting
    rows = []
    for i in range(n):
        blob = i // 20
        vec = [
            spread * blob + 0.01 * ((i * 7 + d * 13) % 11)
            for d in range(dim)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeanspp_init_spreads_centers(spark):
    from fdp_dynamically_controlled_streams_spark.operators.clustering import (
        kmeanspp_init,
    )

    e = _emb_skewed_ids(spark)
    cents = kmeanspp_init(e, k=3)
    blobs = {round(c[0] / 8.0) for c in cents}
    assert blobs == {0, 1, 2}, cents  # one seed per blob


def test_kmeanspp_inertia_beats_fixed_id_init(spark):
    # the r5 verdict's acceptance bar: on the blob fixture where fixed-id
    # init degenerates (all seeds in one blob), k-means++ inertia is
    # STRICTLY lower after the same iteration budget
    e = _emb_skewed_ids(spark)
    pp = (
        kmeans_assign(e, 3, 2, init="kmeanspp")
        .agg(F.sum("dist")).collect()[0][0]
    )
    fixed = (
        kmeans_assign(e, 3, 2, init="ids")
        .agg(F.sum("dist")).collect()[0][0]
    )
    assert pp < fixed, (pp, fixed)


def test_kmeanspp_partition_and_seed_determinism(spark):
    from fdp_dynamically_controlled_streams_spark.operators.clustering import (
        kmeanspp_init,
    )

    e = _emb_skewed_ids(spark)
    a = kmeanspp_init(e, k=3, seed=5)
    b = kmeanspp_init(e.repartition(17), k=3, seed=5)
    assert a == b  # partitioning-invariant
    c = kmeanspp_init(e, k=3, seed=6)
    assert a != c  # the seed is live


def test_arrow_assignment_bit_identical_to_sql(spark):
    """Law: engine='arrow' (numpy kernel, sequential per-dimension fold)
    returns EXACTLY the SQL path's assignment — cell AND the 1e-6-rounded
    distance — on a fixture built to stress tie-breaks and accumulation
    order (near-equidistant rows, float32 values with inexact doubles)."""
    import random

    random.seed(7)
    rows = [
        (i, [round(random.uniform(-1, 1), 3) for _ in range(9)])
        for i in range(120)
    ]
    # rows equidistant to two centroids by construction: duplicate some
    # centroid-seed vectors so dist ties at exactly 0 vs 0 can occur
    rows += [(200 + j, list(rows[j][1])) for j in range(4)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for init in ("ids", "kmeanspp"):
        a = sorted(
            map(tuple, kmeans_assign(e, 4, 2, init=init, engine="sql").collect())
        )
        b = sorted(
            map(tuple, kmeans_assign(e, 4, 2, init=init, engine="arrow").collect())
        )
        assert a == b, init


def _kernel_pdfs():
    """Stress fixture for the flat-vs-two-level kernel parity law: 70
    clustered fine centroids (above TWO_LEVEL_K's regime), points drawn
    near centroids (tight races between neighboring cells), exact
    duplicates of centroid vectors (dist-0 ties), and midpoints between
    centroid pairs (exactly equidistant -> index tie-break)."""
    import random

    import numpy as np
    import pandas as pd

    random.seed(11)
    k, dim = 70, 8
    cents = [
        [round(random.uniform(-1, 1), 3) for _ in range(dim)] for _ in range(k)
    ]
    pts = []
    for i in range(400):
        c = cents[i % k]
        pts.append([round(v + random.uniform(-0.05, 0.05), 3) for v in c])
    pts += [list(cents[j]) for j in range(8)]  # dist-0 ties
    for j in range(0, 16, 2):  # exact midpoints: equidistant pair ties
        pts.append([(a + b) / 2 for a, b in zip(cents[j], cents[j + 1])])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype="int64"),
            "embedding": [np.asarray(p, dtype="float32") for p in pts],
        }
    )
    return cents, pdf


def test_two_level_kernel_bit_identical_to_flat():
    """Law: the two-level (cluster-the-centroids) kernel returns EXACTLY
    the flat kernel's output — cell and unrounded float64 dist — for any
    coarse granularity, including degenerate ones (1 coarse cell = no
    pruning; K = k = every fine centroid its own cell)."""
    from fdp_dynamically_controlled_streams_spark.operators.clustering import (
        _assign_arrow_fn,
        _assign_two_level_arrow_fn,
    )

    cents, pdf = _kernel_pdfs()
    flat = next(_assign_arrow_fn(cents, "vec_id", "embedding")(iter([pdf])))
    for coarse_k in (None, 1, 3, 9, 35, 70):
        two = next(
            _assign_two_level_arrow_fn(
                cents, "vec_id", "embedding", coarse_k=coarse_k
            )(iter([pdf]))
        )
        assert list(flat["id"]) == list(two["id"]), coarse_k
        assert list(flat["cell"]) == list(two["cell"]), coarse_k
        # bit-identical floats, not approximate
        assert list(flat["dist"]) == list(two["dist"]), coarse_k


def test_two_level_kernel_bit_identical_at_extreme_magnitudes():
    """ADVICE r9: the never-prune-a-winner slack is now a derived
    dim·ulp bound, not a tuned constant — exercise the regime the advice
    worried about: vectors with EXTREME magnitude ratios (1e12-scale
    coordinates next to 1e-12-scale ones, boundary-exact ties at both
    scales), where a fixed absolute epsilon under- or over-covers."""
    import random

    import numpy as np
    import pandas as pd

    from fdp_dynamically_controlled_streams_spark.operators.clustering import (
        _assign_arrow_fn,
        _assign_two_level_arrow_fn,
    )

    random.seed(29)
    dim = 6
    cents = []
    for scale in (1e12, 1.0, 1e-12):
        for _ in range(24):
            cents.append(
                [random.uniform(-1, 1) * scale for _ in range(dim)]
            )
    pts = []
    for i in range(300):
        c = cents[i % len(cents)]
        mag = max(abs(v) for v in c) or 1.0
        pts.append([v + random.uniform(-0.05, 0.05) * mag for v in c])
    pts += [list(c) for c in cents[::7]]  # dist-0 ties at every scale
    for j in range(0, 12, 2):  # midpoint ties between huge-scale cells
        pts.append([(a + b) / 2 for a, b in zip(cents[j], cents[j + 1])])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(pts), dtype="int64"),
            "embedding": [np.asarray(p, dtype="float64") for p in pts],
        }
    )
    flat = next(_assign_arrow_fn(cents, "vec_id", "embedding")(iter([pdf])))
    for coarse_k in (None, 4, 24, 72):
        two = next(
            _assign_two_level_arrow_fn(
                cents, "vec_id", "embedding", coarse_k=coarse_k
            )(iter([pdf]))
        )
        assert list(flat["cell"]) == list(two["cell"]), coarse_k
        assert list(flat["dist"]) == list(two["dist"]), coarse_k


def test_two_level_threshold_engages_and_matches_sql(spark):
    """End-to-end: at k >= TWO_LEVEL_K the arrow engine routes through the
    two-level kernel (verified by monkeypatch-free structural check on the
    threshold constant) and still matches the SQL engine exactly."""
    import random

    from fdp_dynamically_controlled_streams_spark.operators.clustering import (
        TWO_LEVEL_K,
    )

    random.seed(13)
    k = TWO_LEVEL_K
    rows = [
        (i, [round(random.uniform(-1, 1), 3) for _ in range(6)])
        for i in range(k * 3)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        map(tuple, kmeans_assign(e, k, 1, init="ids", engine="sql").collect())
    )
    b = sorted(
        map(tuple, kmeans_assign(e, k, 1, init="ids", engine="arrow").collect())
    )
    assert a == b
