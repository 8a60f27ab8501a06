"""Distributed k-means (Lloyd) over the ``embeddings`` table — the document
-clustering stage of a training-data pipeline (topic balancing, domain
mixing, diversity sampling all start from a corpus clustering).

Scale shape (100 TB corpus, k ≤ a few thousand):
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


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "kmeanspp",
    seed: int = 0,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the chosen init and return the
    final assignment: (id, cell, dist) with dist rounded at 1e-6. Ties
    (equal distance to two centroids) break to the lowest cell id in both
    engines.

    init='kmeanspp' (default): deterministic D²-weighted seeding
    (:func:`kmeanspp_init`) — the real algorithm's init, seed-replayable.
    init='ids': centroid j = the embedding of id j (ivf_topk's convention),
    kept as the cheap baseline and for the inertia comparison test."""
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

    def assign(mat: list[list[float]]) -> DataFrame:
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
    k: int = 4,
    n_iter: int = 2,
    table: str = "embeddings",
    init: str = "kmeanspp",
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`kmeans_assign`: the k-means++ seeding rounds
    AND the Lloyd iterations unrolled as CTE chains, identical rounding at
    every boundary, identical left-fold distance accumulation
    (list_reduce), identical priority/tie ordering."""
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
