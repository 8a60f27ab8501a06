"""Product quantization (PQ) ANN tier: compress each embedding to m
sub-space code ids, then answer top-k by asymmetric distance computation
(ADC) — the memory-side complement to the IVF pruning tier in
operators/similarity.py (FAISS pairs them as IVF-PQ; both shapes exist
here as independent, oracle-checked operators).

Why this matters at 100 TB: a 64-dim float32 corpus is 256 B/vector;
PQ(m=4, k=16) is m log2(k) = 2 BYTES/vector — the whole corpus codebook
index fits in a fraction of executor memory, and the scan side of a query
reads codes, not vectors. ADC evaluates each candidate with m integer
table lookups instead of a dim-wide dot product.

Determinism/oracle discipline (same one as operators/clustering.py):
  * codebook seeds = sub-vectors of ids < k (rounded 1e-6), ONE Lloyd
    update with means rounded 1e-6 at the boundary, empty cells keep
    their seed — the DuckDB twin unrolls the identical computation;
  * code assignment argmin ties break to the lowest code id in both
    engines, on bit-identical fixed-order left-fold distances;
  * per-(probe, sub-space, code) ADC cells are rounded 1e-6 and
    integerized to micro-units (round-then-cast), so the per-pair
    distance is an order-independent BIGINT sum.

Scale shape: training is one map-side assignment pass (codebook is ONE
nested array literal — plan cost independent of m*k*dim, the
similarity.ivf_topk lesson) + one groupBy(s, code, dim) with map-side
partial aggregation; the driver holds only the m*k*(dim/m) matrix.
Encoding is map-only. ADC is broadcast(probes) x codes with per-pair
cost m lookups. No shuffle touches the corpus except the 1024-row
codebook mean.

[ABSENT in reference: SURVEY §2.7 — LLM-pipeline engine extension.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: IVF cell sizing target (derived_cells): aim for ~this many vectors
#: per coarse cell so the n_probe-pruned candidate set stays bounded.
CELL_TARGET_OCCUPANCY = 256


def derived_cells(
    n: int,
    target_occupancy: int = CELL_TARGET_OCCUPANCY,
    min_cells: int = 4,
    max_cells: int = 65536,
) -> int:
    """The IVF coarse-cell count AS A FUNCTION OF CORPUS SIZE — the same
    "index parameter tracks the corpus" rule as
    similarity.derived_bits, applied to the k-means quantizer: the
    smallest power-of-two cell count in [min_cells, max_cells] with
    ``target_occupancy * cells >= n``.  At fixed cells the per-probe
    candidate set (~n_probe * n / cells) grows linearly with the corpus;
    deriving cells pins it near n_probe * target_occupancy.  Power-of-
    two steps keep re-derivations infrequent (the quantizer retrains —
    a real cost — only when the corpus doubles past its budget, the
    natural compaction cadence).  Pure integer arithmetic; FAISS's own
    guidance (~sqrt(n) cells) sits inside the same envelope for the
    corpus sizes the catalog exercises.

    [ABSENT in reference: SURVEY §2.7 — engine extension.]"""
    c = min_cells
    while c < max_cells and target_occupancy * c < n:
        c *= 2
    # clamp: when max_cells is not min_cells * 2^k the doubling can step
    # past the cap before the loop condition re-checks (r13 ADVICE);
    # derived_cells_sql already clamps with LEAST — keep the twins equal.
    return min(c, max_cells)


def derived_cells_sql(
    n_expr: str,
    target_occupancy: int = CELL_TARGET_OCCUPANCY,
    min_cells: int = 4,
    max_cells: int = 65536,
) -> str:
    """DuckDB twin of :func:`derived_cells` over a count expression —
    exact integer min over the power-of-two ladder, no float log2."""
    steps = 0
    c = min_cells
    while c < max_cells:
        c *= 2
        steps += 1
    return (
        f"LEAST({max_cells}, GREATEST({min_cells}, COALESCE("
        f"(SELECT min(CAST({min_cells} AS BIGINT) << CAST(r.j AS INT))"
        f" FROM range(0, {steps + 1}) r(j)"
        f" WHERE {target_occupancy} * (CAST({min_cells} AS BIGINT) << CAST(r.j AS INT))"
        f" >= ({n_expr})), {max_cells})))"
    )


def _subs_expr(vec_col: str, m: int, sub: int) -> str:
    """SQL expr: array of m sub-vectors (double) of length ``sub``."""
    return (
        f"transform(sequence(0, {m - 1}),"
        f" s -> transform(slice({vec_col}, s * {sub} + 1, {sub}),"
        f"                x -> CAST(x AS DOUBLE)))"
    )


def _sq_dist_expr(a: str, b: str) -> str:
    """Fixed-order left-fold squared L2 distance between two double arrays
    (bit-identical to DuckDB's list_reduce over list_zip)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _codes_expr(m: int) -> str:
    """SQL expr: the m PQ code ids (argmin sub-space distance, ties to the
    lowest code id) for a row carrying ``subs`` (m sub-vectors) and ``cb``
    (the codebook literal). Shared verbatim by the inline encode passes
    (pq_adc_topk / ivf_pq_topk) and the persisted-index build
    (ivf_pq_index_write), so the at-rest codes are bit-identical to an
    inline encode."""
    return (
        f"transform(sequence(0, {m - 1}), s ->"
        f" CAST(array_position("
        f"   transform(element_at(cb, s + 1),"
        f"             c -> {_sq_dist_expr('element_at(subs, s + 1)', 'c')}),"
        f"   array_min(transform(element_at(cb, s + 1),"
        f"             c -> {_sq_dist_expr('element_at(subs, s + 1)', 'c')}))"
        f" ) - 1 AS INT))"
    )


def _dtab_expr(m: int) -> str:
    """SQL expr: a probe's (m x k) ADC lookup table in micro-units, for a
    row carrying ``subs`` and ``cb`` — shared by every ADC scorer."""
    return (
        f"transform(sequence(0, {m - 1}), s ->"
        f" transform(element_at(cb, s + 1), c ->"
        f"   CAST(round(round({_sq_dist_expr('element_at(subs, s + 1)', 'c')}, 6)"
        f"        * 1000000, 0) AS BIGINT)))"
    )


def _adc_expr(m: int) -> str:
    """SQL expr: the ADC distance — m integer lookups of ``codes`` into
    ``dtab``, order-independent BIGINT sum."""
    return (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT),"
        f" (acc, s) -> acc + element_at(element_at(dtab, s + 1),"
        f"                              element_at(codes, s + 1) + 1))"
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the m codebooks (k codes each): seeds = sub-vectors of the
    first k ids (rounded 1e-6), one Lloyd mean update rounded at the
    boundary, empty cells keep their seed. Returns codebooks[s][j] as a
    (dim/m)-float list. Driver holds only m*k*(dim/m) floats."""
    seed_rows = sorted(
        embeddings.where(F.col(id_col) < k).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    dim = len(seed_rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cb0 = [
        [
            [round(float(x), 6) for x in r[1][s * sub : (s + 1) * sub]]
            for r in seed_rows
        ]
        for s in range(m)
    ]
    assigned = embeddings.select(
        F.col(id_col).alias("id"),
        F.expr(_subs_expr(vec_col, m, sub)).alias("subs"),
    ).select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(0, {m1}), s -> struct(s AS s,"
                " element_at(subs, s + 1) AS sv))".format(m1=m - 1)
            )
        ).alias("e"),
    ).select("id", F.col("e.s").alias("s"), F.col("e.sv").alias("sv"))
    cb_lit = F.lit(cb0)
    d2 = _sq_dist_expr("sv", "c")
    coded = (
        assigned.withColumn("cb", cb_lit)
        .select(
            "s",
            "sv",
            (
                F.expr(
                    f"array_position(transform(element_at(cb, s + 1), c -> {d2}),"
                    f" array_min(transform(element_at(cb, s + 1), c -> {d2})))"
                )
                - 1
            )
            .cast("int")
            .alias("code"),
        )
    )
    means = (
        coded.select("s", "code", F.posexplode("sv").alias("d", "v"))
        .groupBy("s", "code", "d")
        .agg(F.avg("v").alias("mv"))
        .collect()
    )
    upd: dict[tuple[int, int], dict[int, float]] = {}
    for r in means:
        upd.setdefault((int(r["s"]), int(r["code"])), {})[int(r["d"])] = float(
            r["mv"]
        )
    return [
        [
            [round(upd[(s, j)][d], 6) for d in range(sub)]
            if (s, j) in upd
            else cb0[s][j]
            for j in range(k)
        ]
        for s in range(m)
    ]


def pq_adc_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k_nn: int = 5,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cbs: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC top-``k_nn`` (squared-L2) per probe, self excluded: encode
    the corpus to m codes map-side from the trained codebook literal,
    build each probe's (m x k) ADC table in micro-units, then one
    broadcast(probes) x codes join with per-pair cost m integer lookups.
    ``cbs`` lets a caller reuse one :func:`pq_train` result across tiers
    (the recall/ranking reports score three PQ tiers off one training
    pass); ``codes`` lets it score against a PERSISTED (cand_id, codes)
    encode (:func:`ivf_pq_index_write`) instead of re-encoding the
    corpus per query — the scan side then reads codes, not vectors,
    exactly the at-rest shape the module docstring prices. Returns
    (probe_id, cand_id, adc_dist, rank)."""
    if cbs is None:
        cbs = pq_train(embeddings, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    sub = len(cbs[0][0])
    d2 = _sq_dist_expr("sv", "c")
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.expr(_subs_expr(vec_col, m, sub)).alias("subs"),
    ).withColumn("cb", F.lit(cbs))
    enc = (
        base.select(
            F.col("id").alias("cand_id"),
            F.expr(_codes_expr(m)).alias("codes"),
        )
        if codes is None
        else codes
    )
    probes = base.where(F.col("id").isin(probe_ids)).select(
        F.col("id").alias("probe_id"),
        F.expr(_dtab_expr(m)).alias("dtab"),
    )
    pairs = (
        F.broadcast(probes)
        .join(enc, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            F.expr(_adc_expr(m)).alias("dist_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dist_micro").asc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_nn)
        .select(
            "probe_id",
            "cand_id",
            (F.col("dist_micro") / F.lit(1000000.0)).alias("adc_dist"),
            "rank",
        )
    )


def pq_adc_topk_sql(
    probe_list: str,
    k_nn: int = 5,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`pq_adc_topk`: seeds, the single Lloyd update,
    encoding, ADC tables and the integer pair sum all unrolled with
    identical rounding and tie order."""
    sub = dim // m
    d2 = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)"
    )
    d_sv_c = d2.format(a="sv", b="c")
    return f"""
WITH subv AS (
  SELECT vec_id, s,
         list_transform(embedding[s * {sub} + 1 : s * {sub} + {sub}],
                        x -> CAST(x AS DOUBLE)) AS sv
  FROM {table}, UNNEST(generate_series(0, {m - 1})) AS t(s)
), seed AS (
  SELECT s, CAST(vec_id AS INT) AS j,
         list_transform(sv, x -> round(x, 6)) AS c
  FROM subv WHERE vec_id < {k_codes}
), a0 AS (
  SELECT vec_id, s, sv, j AS code FROM (
    SELECT sb.vec_id, sb.s, sb.sv, sd.j,
           row_number() OVER (PARTITION BY sb.vec_id, sb.s
                              ORDER BY {d2.format(a="sb.sv", b="sd.c")}, sd.j)
             AS rk
    FROM subv sb JOIN seed sd ON sd.s = sb.s
  ) WHERE rk = 1
), m1 AS (
  SELECT s, code, ord, round(avg(v), 6) AS mv FROM (
    SELECT s, code, generate_subscripts(sv, 1) AS ord, unnest(sv) AS v
    FROM a0
  ) GROUP BY s, code, ord
), cb1 AS (
  SELECT sd.s, sd.j,
         CASE WHEN count(m1.mv) = 0 THEN sd.c
              ELSE list(m1.mv ORDER BY m1.ord) END AS c
  FROM seed sd LEFT JOIN m1 ON m1.s = sd.s AND m1.code = sd.j
  GROUP BY sd.s, sd.j, sd.c
), enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT sb.vec_id, sb.s, cb.j,
           row_number() OVER (PARTITION BY sb.vec_id, sb.s
                              ORDER BY {d2.format(a="sb.sv", b="cb.c")}, cb.j)
             AS rk
    FROM subv sb JOIN cb1 cb ON cb.s = sb.s
  ) WHERE rk = 1
), dt AS (
  SELECT sb.vec_id AS probe_id, sb.s, cb.j,
         CAST(round(round({d2.format(a="sb.sv", b="cb.c")}, 6) * 1000000, 0)
              AS BIGINT) AS dm
  FROM subv sb JOIN cb1 cb ON cb.s = sb.s
  WHERE sb.vec_id IN ({probe_list})
), pair AS (
  SELECT dt.probe_id, enc.vec_id AS cand_id, sum(dt.dm) AS dist_micro
  FROM dt JOIN enc
    ON enc.s = dt.s AND enc.code = dt.j AND enc.vec_id <> dt.probe_id
  GROUP BY dt.probe_id, enc.vec_id
)
SELECT probe_id, cand_id, adc_dist, rank FROM (
  SELECT probe_id, cand_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dist_micro ASC, cand_id ASC) AS rank,
         dist_micro / 1000000.0 AS adc_dist
  FROM pair
) WHERE rank <= {k_nn}
"""


def ivf_pq_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k_nn: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cbs: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ — the production ANN composition (FAISS's IndexIVFPQ shape):
    the IVF coarse quantizer restricts each probe to its ``n_probe``
    closest cells (pruning: only ~n_probe/n_cells of the corpus is
    touched), and PQ-ADC scores the surviving candidates with m integer
    lookups each (compression: the scored side reads 2-byte codes).

    At 100 TB this is the only tier whose cost is sub-linear in BOTH
    candidates touched AND bytes per candidate; the corpus at rest is
    partitioned by cell with the code column bucketed alongside, so a
    probe reads n_probe directories of 2-byte codes. The coarse stage
    reuses :func:`similarity.ivf_partition` verbatim (cosine argmax to
    fixed-id centroids, the oracle-checkable stand-in for a trained
    coarse quantizer); the fine stage reuses this module's trained
    codebooks (pass ``cbs`` to share one training pass across tiers).
    Returns (probe_id, cand_id, adc_dist, rank)."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ivf_partition,
    )

    assigned, probe_cells = ivf_partition(
        embeddings, probe_ids, n_cells, n_probe, id_col, vec_col
    )
    if cbs is None:
        cbs = pq_train(embeddings, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    sub = len(cbs[0][0])
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.expr(_subs_expr(vec_col, m, sub)).alias("subs"),
    ).withColumn("cb", F.lit(cbs))
    enc = base.select(
        F.col("id").alias("cand_id"),
        F.expr(_codes_expr(m)).alias("codes"),
    )
    probes = base.where(F.col("id").isin(probe_ids)).select(
        F.col("id").alias("probe_id"),
        F.expr(_dtab_expr(m)).alias("dtab"),
    )
    # candidate set: corpus rows in the probe's probed cells only
    cand = (
        F.broadcast(probe_cells.select("probe_id", "cell"))
        .join(assigned.select("cand_id", "cell"), "cell")
        .where(F.col("probe_id") != F.col("cand_id"))
        .select("probe_id", "cand_id")
    )
    pairs = (
        cand.join(F.broadcast(probes), "probe_id")
        .join(enc, "cand_id")
        .select(
            "probe_id",
            "cand_id",
            F.expr(_adc_expr(m)).alias("dist_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dist_micro").asc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_nn)
        .select(
            "probe_id",
            "cand_id",
            (F.col("dist_micro") / F.lit(1000000.0)).alias("adc_dist"),
            "rank",
        )
    )


def ivf_pq_index_write(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cbs: list[list[list[float]]] | None = None,
) -> None:
    """Materialize the IVF-PQ index — the cell-ASSIGNED, PQ-ENCODED
    corpus (cand_id, codes, cell), written PARTITIONED BY cell — the
    at-rest layout both IVF-PQ docstrings price ("the corpus at rest is
    cell-partitioned 2-byte codes") made an actual persisted artifact,
    exactly :func:`similarity.ivf_index_write`'s index-once / query-many
    split with the code column bucketed alongside the cell.  The encode
    uses the same ``_codes_expr`` the inline paths use, so the persisted
    codes are bit-identical to a per-query encode."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ivf_partition,
    )

    if cbs is None:
        cbs = pq_train(embeddings, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    sub = len(cbs[0][0])
    assigned, _ = ivf_partition(embeddings, [], n_cells, 1, id_col, vec_col)
    (
        assigned.select(
            "cand_id",
            "cell",
            F.expr(_subs_expr("cand_vec", m, sub)).alias("subs"),
        )
        .withColumn("cb", F.lit(cbs))
        .select("cand_id", "cell", F.expr(_codes_expr(m)).alias("codes"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )


def ivf_pq_topk_from_index(
    spark,
    path: str,
    embeddings: DataFrame,
    probe_ids: list[int],
    k_nn: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cbs: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Query phase of IVF-PQ against an index written by
    :func:`ivf_pq_index_write` (the :func:`similarity.ivf_topk_from_index`
    read discipline applied to the PQ composition): probe cell-ranking
    recomputes against the collected centroid literal, the candidate scan
    reads ONLY the probes' cell= directories of the persisted 2-byte
    codes via a static partition filter — never a float vector — and ADC
    scores them with m integer lookups.  Value-identical to
    :func:`ivf_pq_topk` on the same corpus (the persisted codes are the
    same ``_codes_expr`` encode; parquet round-trips ints exactly)."""
    from fdp_dynamically_controlled_streams_spark.operators.similarity import (
        ivf_partition,
    )

    if cbs is None:
        cbs = pq_train(embeddings, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    sub = len(cbs[0][0])
    _, probe_cells = ivf_partition(
        embeddings, probe_ids, n_cells, n_probe, id_col, vec_col,
        probe_only=True,
    )
    probe_cells = probe_cells.localCheckpoint()  # computed once: filter + join
    cell_union = sorted(
        {int(r[0]) for r in probe_cells.select("cell").distinct().collect()}
    )
    enc = spark.read.parquet(f"{path}/codes").where(
        F.col("cell").isin(cell_union)
    )
    probes = (
        embeddings.where(F.col(id_col).isin(probe_ids))
        .select(
            F.col(id_col).alias("probe_id"),
            F.expr(_subs_expr(vec_col, m, sub)).alias("subs"),
        )
        .withColumn("cb", F.lit(cbs))
        .select("probe_id", F.expr(_dtab_expr(m)).alias("dtab"))
    )
    pairs = (
        F.broadcast(probe_cells.select("probe_id", "cell"))
        .join(enc, "cell")
        .where(F.col("probe_id") != F.col("cand_id"))
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            "cand_id",
            F.expr(_adc_expr(m)).alias("dist_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dist_micro").asc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_nn)
        .select(
            "probe_id",
            "cand_id",
            (F.col("dist_micro") / F.lit(1000000.0)).alias("adc_dist"),
            "rank",
        )
    )


def ivf_pq_topk_sql(
    probe_list: str,
    cosine_sql_fn,
    k_nn: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`ivf_pq_topk`: the IVF cell CTEs (identical to
    the ann_ivf_topk oracle) feed the PQ CTEs (identical to the
    ann_pq_adc_topk oracle); ``cosine_sql_fn(a, b)`` renders the repo's
    shared cosine expression."""
    sub = dim // m
    d2 = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)"
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM {table} WHERE vec_id < {n_cells}
), assign0 AS (
  SELECT cand_id, cid, s,
         row_number() OVER (PARTITION BY cand_id ORDER BY s DESC, cid) AS rk
  FROM (
    SELECT e.vec_id AS cand_id, c.cid,
           {cosine_sql_fn("e.embedding", "c.cvec")} AS s
    FROM {table} e CROSS JOIN cent c
  )
), cells AS (
  SELECT cand_id, cid AS cell FROM assign0 WHERE rk = 1
), probe_cells AS (
  SELECT cand_id AS probe_id, cid AS cell
  FROM assign0 WHERE cand_id IN ({probe_list}) AND rk <= {n_probe}
), subv AS (
  SELECT vec_id, s,
         list_transform(embedding[s * {sub} + 1 : s * {sub} + {sub}],
                        x -> CAST(x AS DOUBLE)) AS sv
  FROM {table}, UNNEST(generate_series(0, {m - 1})) AS t(s)
), seed AS (
  SELECT s, CAST(vec_id AS INT) AS j,
         list_transform(sv, x -> round(x, 6)) AS c
  FROM subv WHERE vec_id < {k_codes}
), a0 AS (
  SELECT vec_id, s, sv, j AS code FROM (
    SELECT sb.vec_id, sb.s, sb.sv, sd.j,
           row_number() OVER (PARTITION BY sb.vec_id, sb.s
                              ORDER BY {d2.format(a="sb.sv", b="sd.c")}, sd.j)
             AS rk
    FROM subv sb JOIN seed sd ON sd.s = sb.s
  ) WHERE rk = 1
), m1 AS (
  SELECT s, code, ord, round(avg(v), 6) AS mv FROM (
    SELECT s, code, generate_subscripts(sv, 1) AS ord, unnest(sv) AS v
    FROM a0
  ) GROUP BY s, code, ord
), cb1 AS (
  SELECT sd.s, sd.j,
         CASE WHEN count(m1.mv) = 0 THEN sd.c
              ELSE list(m1.mv ORDER BY m1.ord) END AS c
  FROM seed sd LEFT JOIN m1 ON m1.s = sd.s AND m1.code = sd.j
  GROUP BY sd.s, sd.j, sd.c
), enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT sb.vec_id, sb.s, cb.j,
           row_number() OVER (PARTITION BY sb.vec_id, sb.s
                              ORDER BY {d2.format(a="sb.sv", b="cb.c")}, cb.j)
             AS rk
    FROM subv sb JOIN cb1 cb ON cb.s = sb.s
  ) WHERE rk = 1
), dt AS (
  SELECT sb.vec_id AS probe_id, sb.s, cb.j,
         CAST(round(round({d2.format(a="sb.sv", b="cb.c")}, 6) * 1000000, 0)
              AS BIGINT) AS dm
  FROM subv sb JOIN cb1 cb ON cb.s = sb.s
  WHERE sb.vec_id IN ({probe_list})
), cand AS (
  SELECT p.probe_id, c.cand_id
  FROM probe_cells p JOIN cells c ON c.cell = p.cell
  WHERE c.cand_id <> p.probe_id
), pair AS (
  SELECT cd.probe_id, cd.cand_id, sum(dt.dm) AS dist_micro
  FROM cand cd
  JOIN enc ON enc.vec_id = cd.cand_id
  JOIN dt ON dt.probe_id = cd.probe_id AND dt.s = enc.s AND dt.j = enc.code
  GROUP BY cd.probe_id, cd.cand_id
)
SELECT probe_id, cand_id, adc_dist, rank FROM (
  SELECT probe_id, cand_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dist_micro ASC, cand_id ASC) AS rank,
         dist_micro / 1000000.0 AS adc_dist
  FROM pair
) WHERE rank <= {k_nn}
"""


def ivf_pq_rerank_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k_nn: int = 5,
    shortlist: int = 20,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cbs: list[list[list[float]]] | None = None,
    spark=None,
    index_path: str | None = None,
) -> DataFrame:
    """Two-stage retrieval — the standard production ANN serving shape:
    IVF-PQ ADC produces a cheap ``shortlist`` of candidates per probe
    (2-byte codes, integer lookups), then ONLY those shortlist rows are
    re-scored with the exact full-precision cosine and the final top-k
    is taken on the exact score.

    Why this is the 100 TB shape: the expensive exact kernel (dim-wide
    dot product against full float vectors) runs on shortlist x probes
    rows — thousands, not the corpus — while the corpus-sized stage
    touches only cell-pruned compressed codes. Recall comes from the
    shortlist being a few times k; precision of the final ranking is
    exact by construction. The full-vector fetch is an equi-join on
    cand_id against the at-rest corpus (id-bucketed => shuffle-free).

    Returns (probe_id, cand_id, score, rank) — same schema as
    ``brute_force_topk``, so recall vs the exact tier is directly
    comparable."""
    # ``index_path`` (with ``spark``): shortlist from the PERSISTED
    # cell-partitioned codes (ivf_pq_index_write) instead of re-encoding
    # the corpus per query — value-identical (same _codes_expr encode).
    short = (
        ivf_pq_topk_from_index(
            spark, index_path, embeddings, probe_ids, k_nn=shortlist,
            n_cells=n_cells, n_probe=n_probe, m=m, k_codes=k_codes,
            id_col=id_col, vec_col=vec_col, cbs=cbs,
        )
        if index_path is not None
        else ivf_pq_topk(
            embeddings, probe_ids, k_nn=shortlist, n_cells=n_cells,
            n_probe=n_probe, m=m, k_codes=k_codes, id_col=id_col,
            vec_col=vec_col, cbs=cbs,
        )
    ).select("probe_id", "cand_id")
    from fdp_dynamically_controlled_streams_spark.functions.vectors import cosine

    probes = embeddings.where(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    scored = (
        short.join(F.broadcast(probes), "probe_id")
        .join(corpus, "cand_id")
        .select(
            "probe_id",
            "cand_id",
            F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k_nn)
        .select("probe_id", "cand_id", "score", "rank")
    )


def ivf_pq_rerank_topk_sql(
    probe_list: str,
    cosine_sql_fn,
    k_nn: int = 5,
    shortlist: int = 20,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`ivf_pq_rerank_topk`: the full IVF-PQ oracle
    (at shortlist depth) as a CTE, exact-cosine re-scoring on top."""
    inner = ivf_pq_topk_sql(
        probe_list, cosine_sql_fn, k_nn=shortlist, n_cells=n_cells,
        n_probe=n_probe, m=m, k_codes=k_codes, dim=dim, table=table,
    )
    return f"""
WITH short AS (SELECT probe_id, cand_id FROM ({inner}) x),
rescored AS (
  SELECT s.probe_id, s.cand_id,
         round({cosine_sql_fn("p.embedding", "c.embedding")}, 6) AS score
  FROM short s
  JOIN {table} p ON p.vec_id = s.probe_id
  JOIN {table} c ON c.vec_id = s.cand_id
)
SELECT probe_id, cand_id, score, rank FROM (
  SELECT probe_id, cand_id, score,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY score DESC, cand_id ASC) AS rank
  FROM rescored
) WHERE rank <= {k_nn}
"""
