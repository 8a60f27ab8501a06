"""Distributed k-means (Lloyd) over the ``embeddings`` table — the document
-clustering stage of a training-data pipeline (topic balancing, domain
mixing, diversity sampling all start from a corpus clustering).

Scale shape (100 TB corpus; flat assignment to k ≈ a few thousand, the
two-level cluster-the-centroids kernel past TWO_LEVEL_K with bit-identical
output — see _assign_two_level_arrow_fn):
  * ASSIGNMENT is map-side and shuffle-free — the k×dim centroid matrix is
    a single nested array Literal (same trick as similarity.ivf_topk: one
    Literal node + a `transform` HOF, so plan-analysis cost is independent
    of k×dim) and `argmin distance` is one codegen'd projection over the
    scan;
  * the UPDATE step is ONE groupBy(cell) aggregation per iteration with
    map-side partial aggregation — dim `avg` columns, all JVM-side;
  * the driver holds only the k×dim matrix between iterations (bounded
    control structure, like dedup_clusters' convergence counter); the
    corpus never collects and never re-shuffles on the same keys.

Exact-oracle discipline: centroids are ROUNDED to 6 decimals at every
iteration boundary in BOTH engines, so the (order-dependent) float mean
never cascades into assignment flips — distances are then computed from
bit-identical centroid inputs with identical left-fold accumulation order,
making cell assignments value-hash-comparable against the DuckDB twin.

[ABSENT in reference: SURVEY §2.7 — LLM-pipeline engine extension.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: hash range for the derandomized uniform draw (same constant as
#: sampling.weighted_bottomk_sample's A-ES scheme).
_HASH_RANGE = float(1 << 60)


def _sq_dist(vec, cent):
    """Squared euclidean distance, element-order left fold (exact plan)."""
    return F.aggregate(
        F.zip_with(
            vec, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeanspp_init(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> list[list[float]]:
    """Deterministic k-means++ initialization: D²-weighted sequential center
    selection, derandomized with the A-ES trick the repo's weighted sampler
    already proves cross-engine (sampling.weighted_bottomk_sample) — row r
    draws u = uniform(0,1) from its key hash; round j picks
    argmin -ln(u)/D²(r) where D² is the (1e-6-rounded) squared distance to
    the nearest already-chosen center. That argmin IS a draw with
    probability ∝ D² (Efraimidis-Spirakis), so this is the k-means++
    seeding distribution with the randomness replaced by the seeded hash —
    reproducible on any cluster, any partitioning, and replayable by the
    SQL oracle.

    Scale shape: each of the k rounds is ONE shuffle-free
    TakeOrderedAndProject(1) over a two-column scan (vector + id), with the
    chosen-center matrix a single array literal — k bounded driver
    decisions of k×dim floats each, exactly the dedup_clusters convergence
    pattern. Points coincident with a chosen center (D² = 0) are excluded,
    per the k-means++ definition. Selection discipline: the float priority
    is ordered on, never output (last-ulp ln() differences cannot surface).

    Returns the k centers (rounded 1e-6, selection order)."""
    u = (
        portable_hash64(F.col(id_col).cast("string"), seed=seed) + F.lit(0.5)
    ) / F.lit(_HASH_RANGE)
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        u.alias("_u"),
    )
    first = base.orderBy("_u", "id").limit(1).collect()[0]
    cents = [[round(float(x), 6) for x in first["vec"]]]
    for _ in range(1, k):
        m = F.lit(cents)
        d2 = F.round(
            F.array_min(F.transform(m, lambda c: _sq_dist(F.col("vec"), c))), 6
        )
        nxt = (
            base.withColumn("_d2", d2)
            .where(F.col("_d2") > 0)
            .withColumn("_pri", -F.log("_u") / F.col("_d2"))
            .orderBy("_pri", "id")
            .take(1)
        )
        if not nxt:
            # fewer distinct points than k: every remaining point coincides
            # with a chosen center. Stop (no padding) — the SQL twin's
            # empty init_j CTE contributes nothing either, so both engines
            # proceed with the same (shorter) center list.
            break
        cents.append([round(float(x), 6) for x in nxt[0]["vec"]])
    return cents


def _assign_arrow_fn(cents: list[list[float]], id_col: str, vec_col: str):
    """mapInPandas kernel for the Arrow assignment path: SAME math, SAME
    accumulation order, SAME tie-break as the JVM HOF path, so results are
    bit-identical (law-tested in tests/test_clustering.py):

      * elements widen float32 -> float64 (exact), then the squared
        distance accumulates ONE DIMENSION AT A TIME across the whole
        (batch x k) matrix — a sequential left fold in d, matching
        F.aggregate / list_reduce exactly (numpy's own sum() would use
        pairwise summation and drift in the last ulp);
      * np.argmin takes the FIRST minimum — the lowest-cell tie-break of
        array_position(array_min).
    """
    import numpy as np
    import pandas as pd

    def fn(batches):
        C = np.asarray(cents, dtype=np.float64)  # k x dim
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"id": pdf[id_col], "vec": pdf[vec_col],
                     "cell": pd.Series([], dtype="int32"),
                     "dist": pd.Series([], dtype="float64")}
                )
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # n x dim
            acc = np.zeros((len(X), C.shape[0]))
            for d in range(C.shape[1]):  # sequential fold in d (see above)
                diff = X[:, d : d + 1] - C[None, :, d]
                acc += diff * diff
            cell = np.argmin(acc, axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "vec": pdf[vec_col],
                 "cell": cell.astype("int32"),
                 "dist": acc[np.arange(len(X)), cell]}
            )

    return fn


#: fine-centroid count at/above which the Arrow assignment goes two-level
#: (cluster-the-centroids). Chosen so the sf1 tier replay (k = 80 at the
#: probe's corpus-scaled cell size) exercises the path in production while
#: the small SFs stay on the flat kernel.
TWO_LEVEL_K = 64


def _coarse_structure(cents: list[list[float]], coarse_k: int | None = None):
    """Cluster the k fine centroids into ~sqrt(k) coarse cells (driver-side
    numpy Lloyd, ids-init — centroid j of the COARSE tier starts as fine
    centroid j, mirroring clustering's 'ids' convention). The coarse tier is
    pure BLOCKING STRUCTURE: it bounds which fine centroids a point must be
    compared against, and the triangle-inequality pruning in
    :func:`_assign_two_level_arrow_fn` guarantees the final assignment is
    EXACTLY the flat argmin whatever this clustering looks like — so its
    float arithmetic needs no cross-engine discipline, only determinism
    (plain numpy ops on the driver, no RNG).

    Returns (G, groups, radii): K×dim coarse centroids, per-coarse-cell
    fine-index arrays (ascending — preserves the global first-min
    tie-break), and per-cell covering radii max‖fine − coarse‖ inflated by
    one ulp-scale factor so float rounding can never make the bound
    under-cover."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    k = len(C)
    K = coarse_k if coarse_k is not None else max(2, int(round(k**0.5)))
    K = min(K, k)
    G = C[:K].copy()
    for _ in range(4):
        d2 = ((C[:, None, :] - G[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(K):
            members = C[a == j]
            if len(members):
                G[j] = members.mean(axis=0)
    d2 = ((C[:, None, :] - G[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    groups = []
    radii = []
    centers = []
    # Derived ulp-scale inflation (ADVICE r9): the radius is sqrt of a
    # dim-term positive fold, whose forward relative error is bounded by
    # (dim+2)·eps (one eps per add, two per squared term) and sqrt adds
    # ~eps/2 — so (dim+8)·eps relative over-covers the rounding at ANY
    # operand magnitude. Floored at the old 1e-12 constant so the bound is
    # never looser than what every checked-in hash was produced with;
    # inflating a covering radius only widens coverage (scan more cells,
    # same argmin), never breaks exactness.
    rs = max(1e-12, (C.shape[1] + 8) * float(np.finfo(np.float64).eps))
    for j in range(K):
        idx = np.nonzero(a == j)[0]
        if idx.size == 0:
            continue  # empty coarse cell covers nothing — drop it
        groups.append(idx)
        radii.append(float(np.sqrt(d2[idx, j].max())) * (1.0 + rs) + 1e-12)
        centers.append(G[j])
    return np.asarray(centers), groups, np.asarray(radii)


def _assign_two_level_arrow_fn(
    cents: list[list[float]],
    id_col: str,
    vec_col: str,
    coarse_k: int | None = None,
):
    """Two-level (cluster-the-centroids) Arrow assignment: EXACTLY equal to
    :func:`_assign_arrow_fn` — same floats, same cell, same dist — while
    touching only O(sqrt(k)) coarse cells + the unpruned fine subsets per
    point instead of all k fine centroids (law-tested bit-parity in
    tests/test_clustering.py).

    Why it is exact, not approximate:
      * every examined (point, fine-centroid) distance accumulates ONE
        DIMENSION AT A TIME over the fine subset — the identical scalar
        sequence (X[i,d]-C[j,d])² added in d order as the flat kernel's
        full-matrix fold, so examined distances are bit-identical;
      * a coarse cell is skipped only when its triangle-inequality lower
        bound (‖p−coarse‖ − radius)², slack-inflated, exceeds the current
        best — in exact arithmetic no member could beat OR TIE the best,
        and the 1e-9 relative slack absorbs the sqrt/fold rounding, so no
        candidate that could win the lexicographic (dist, index) min is
        ever pruned;
      * updates are lexicographic on (dist, fine index) with ascending
        index order inside each cell — the global first-min tie-break of
        np.argmin / array_position(array_min).

    This is the >10M-vector scale path the SemDeDup docstring promises: at
    corpus-scaled k the flat kernel's n×k distance matrix outgrows a task,
    while the two-level scan stays n×O(sqrt(k)) with the same answer."""
    import numpy as np
    import pandas as pd

    G0, groups0, radii0 = _coarse_structure(cents, coarse_k)

    def fn(batches):
        C = np.asarray(cents, dtype=np.float64)  # k x dim
        G, groups, radii = G0, groups0, radii0
        K = len(groups)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"id": pdf[id_col], "vec": pdf[vec_col],
                     "cell": pd.Series([], dtype="int32"),
                     "dist": pd.Series([], dtype="float64")}
                )
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # n x dim
            n = len(X)
            accG = np.zeros((n, K))
            for d in range(C.shape[1]):
                diff = X[:, d : d + 1] - G[None, :, d]
                accG += diff * diff
            near = np.argmin(accG, axis=1)
            dG = np.sqrt(accG)
            best = np.full(n, np.inf)
            besti = np.full(n, -1, dtype=np.int64)

            def scan(j: int, mask) -> None:
                idx = np.nonzero(mask)[0]
                if idx.size == 0:
                    return
                fidx = groups[j]  # ascending fine indices
                sub = C[fidx]
                acc = np.zeros((idx.size, len(fidx)))
                Xs = X[idx]
                for d in range(C.shape[1]):  # sequential fold in d
                    diff = Xs[:, d : d + 1] - sub[None, :, d]
                    acc += diff * diff
                a = np.argmin(acc, axis=1)  # first min -> lowest fine idx
                cd = acc[np.arange(idx.size), a]
                ci = fidx[a]
                take = (cd < best[idx]) | (
                    (cd == best[idx]) & (ci < besti[idx])
                )
                upd = idx[take]
                best[upd] = cd[take]
                besti[upd] = ci[take]

            for j in range(K):  # phase 1: each point's home coarse cell
                scan(j, near == j)
            # Derived pruning slack (ADVICE r9): never-prune-a-winner must
            # hold at ANY operand magnitude, so the slack is a BOUND, not a
            # tuned constant. lb = ‖p−G_j‖ − r_j carries absolute rounding
            # error ≤ c_eps·(‖p−G_j‖ + r_j) with c_eps = (dim+8)·eps (the
            # dim-term fold + sqrt + subtract); subtracting that magnitude-
            # scaled term before squaring makes lb² a true lower bound even
            # for vectors with extreme magnitude ratios. The relative slack
            # on `best` covers the examined-distance fold the same way and
            # is floored at the old empirical 1e-9 so pruning only ever gets
            # WEAKER than what every checked-in hash ran with — extra
            # scanned cells are exact, so the output is invariant.
            eps = float(np.finfo(np.float64).eps)
            c_eps = (C.shape[1] + 8) * eps
            rel = max(1e-9, 4 * c_eps)
            for j in range(K):  # phase 2: unpruned neighbor cells
                lb = dG[:, j] - radii[j] - c_eps * (dG[:, j] + radii[j])
                np.maximum(lb, 0.0, out=lb)
                scan(j, (near != j) & (lb * lb <= best * (1 + rel) + 1e-9))
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "vec": pdf[vec_col],
                 "cell": besti.astype("int32"),
                 "dist": best}
            )

    return fn


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "kmeanspp",
    seed: int = 0,
    engine: str = "sql",
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the chosen init and return the
    final assignment: (id, cell, dist) with dist rounded at 1e-6. Ties
    (equal distance to two centroids) break to the lowest cell id in both
    engines.

    init='kmeanspp' (default): deterministic D²-weighted seeding
    (:func:`kmeanspp_init`) — the real algorithm's init, seed-replayable.
    init='ids': centroid j = the embedding of id j (ivf_topk's convention),
    kept as the cheap baseline and for the inertia comparison test.

    engine='sql' (default): the assignment is a pure-JVM codegen
    projection (zero Python) — right for small k. engine='arrow': ONE
    declared mapInPandas boundary computing the n×k distance matrix in
    numpy with the EXACT fold order of the SQL path (bit-identical,
    law-tested) — right when k scales with the corpus: at k=80/dim=64 the
    interpreted HOF lambda fold measured 36.6 s for three assignment
    passes over 20 k rows where the Arrow kernel is ~100 M vectorized
    flops. Same discipline as udx_arrow_doc_stats: Arrow-batched, never
    row-at-a-time."""
    if init == "kmeanspp":
        cents = kmeanspp_init(embeddings, k, id_col, vec_col, seed=seed)
    elif init == "ids":
        rows = sorted(
            embeddings.where(F.col(id_col) < k).select(id_col, vec_col).collect(),
            key=lambda r: r[0],
        )
        cents = [[round(float(x), 6) for x in r[1]] for r in rows]
    else:
        raise ValueError(f"unknown init {init!r}")
    dim = len(cents[0])
    id_type = embeddings.schema[id_col].dataType.simpleString()
    vec_type = embeddings.schema[vec_col].dataType.simpleString()

    def assign(mat: list[list[float]]) -> DataFrame:
        if engine == "arrow":
            # At corpus-scaled k the flat n×k distance matrix outgrows a
            # task; past TWO_LEVEL_K the kernel switches to the two-level
            # (cluster-the-centroids) scan — bit-identical output (law test
            # in tests/test_clustering.py), so catalog hashes are invariant
            # to which side of the threshold a tier lands on.
            kern = (
                _assign_two_level_arrow_fn(mat, id_col, vec_col)
                if len(mat) >= TWO_LEVEL_K
                else _assign_arrow_fn(mat, id_col, vec_col)
            )
            return embeddings.select(id_col, vec_col).mapInPandas(
                kern,
                schema=f"id {id_type}, vec {vec_type}, cell int, dist double",
            )
        m = F.lit(mat)
        dists = F.transform(m, lambda c: _sq_dist(F.col(vec_col), c))
        return embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            dists.alias("_d"),
        ).select(
            "id",
            "vec",
            # argmin via first occurrence of the min: lowest-cell tie-break,
            # zero shuffle (array_position is 1-based -> cell is 0-based).
            (F.array_position("_d", F.array_min("_d")) - 1).cast("int").alias("cell"),
            F.array_min("_d").alias("dist"),
        )

    for _ in range(n_iter):
        assigned = assign(cents)
        # posexplode + groupBy(cell, dim): map-side partial agg collapses to
        # k×dim rows before the exchange; the packed-array alternative (dim
        # separate avg aggregates) pays a dim-wide analysis/codegen forest —
        # measured 5-6x slower at probe scale (same lesson as the centroid
        # literal: plan cost must not scale with k×dim).
        means = (
            assigned.select("cell", F.posexplode("vec").alias("_d", "_v"))
            .groupBy("cell", "_d")
            .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
            .collect()
        )
        # Rounded at the iteration boundary (see module docstring); a cell
        # that lost all members keeps its previous centroid.
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["_d"])] = float(r["_m"])
        cents = [
            [round(by_cell[j][i], 6) for i in range(dim)]
            if j in by_cell
            else cents[j]
            for j in range(len(cents))  # may be < k (degenerate init)
        ]

    return assign(cents).select(
        F.col("id").alias(id_col),
        "cell",
        F.round("dist", 6).alias("dist"),
    )


def kmeans_oracle_sql(
    k: int | str = 4,
    n_iter: int = 2,
    table: str = "embeddings",
    init: str = "kmeanspp",
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`kmeans_assign`: the k-means++ seeding rounds
    AND the Lloyd iterations unrolled as CTE chains, identical rounding at
    every boundary, identical left-fold distance accumulation
    (list_reduce), identical priority/tie ordering.

    With ``init='ids'``, ``k`` may be a SQL EXPRESSION string (e.g.
    ``"greatest(4, (SELECT count(*) FROM embeddings) // 250)"``): the
    ids-init centroid set is just ``WHERE vec_id < k``, so a
    data-dependent k — the corpus-scaled blocking semantic_dedup needs to
    stay sub-quadratic — is expressible in a STATIC oracle, which the
    unrolled k-means++ rounds (one CTE per center) can never be."""
    if init != "ids" and not isinstance(k, int):
        raise ValueError("expression k requires init='ids'")
    dist = (
        "list_reduce(list_transform(list_zip(e.embedding, c.c),"
        " p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),"
        " (acc, v) -> acc + v)"
    )
    if init == "kmeanspp":
        h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed)
        u = f"(({h} + 0.5) / {_HASH_RANGE!r})"
        rc = "list_transform(e.embedding, x -> round(CAST(x AS DOUBLE), 6))"
        parts = [
            f"""init_0 AS (
  SELECT 0 AS cell, {rc} AS c
  FROM {table} e ORDER BY {u}, vec_id LIMIT 1)"""
        ]
        for j in range(1, k):
            prev = " UNION ALL ".join(
                f"SELECT c FROM init_{i}" for i in range(j)
            )
            parts.append(
                f"""init_{j} AS (
  SELECT {j} AS cell, c FROM (
    SELECT {rc} AS c, e.vec_id,
           round(min({dist}), 6) AS d2, min({u}) AS u
    FROM {table} e CROSS JOIN ({prev}) c
    GROUP BY e.vec_id, e.embedding
  ) WHERE d2 > 0 ORDER BY (-ln(u)) / d2, vec_id LIMIT 1)"""
            )
        parts.append(
            "cents_0 AS ("
            + " UNION ALL ".join(
                f"SELECT cell, c FROM init_{i}" for i in range(k)
            )
            + ")"
        )
    else:
        parts = [
            f"""cents_0 AS (
  SELECT CAST(vec_id AS INT) AS cell,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS c
  FROM {table} WHERE vec_id < {k})"""
        ]
    for i in range(n_iter):
        parts.append(
            f"""assign_{i} AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, c.cell, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist}, c.cell) AS rk
    FROM {table} e CROSS JOIN cents_{i} c) WHERE rk = 1)"""
        )
        parts.append(
            f"""elems_{i} AS (
  SELECT cell, generate_subscripts(embedding, 1) AS ord,
         unnest(embedding) AS v
  FROM assign_{i}),
means_{i + 1} AS (
  SELECT cell, ord, round(avg(CAST(v AS DOUBLE)), 6) AS m
  FROM elems_{i}
  GROUP BY cell, ord),
cents_{i + 1} AS (
  SELECT p.cell,
         CASE WHEN count(m.m) = 0 THEN p.c
              ELSE list(m.m ORDER BY m.ord) END AS c
  FROM cents_{i} p LEFT JOIN means_{i + 1} m USING (cell)
  GROUP BY p.cell, p.c)"""
        )
    final = f"""
SELECT vec_id, cell, round(dist, 6) AS dist FROM (
  SELECT e.vec_id, c.cell, {dist} AS dist,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dist}, c.cell) AS rk
  FROM {table} e CROSS JOIN cents_{n_iter} c) WHERE rk = 1"""
    return "WITH " + ",\n".join(parts) + final
