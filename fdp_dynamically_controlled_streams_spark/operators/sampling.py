"""Deterministic sampling and dataset splitting for training-data pipelines.

The reference has no sampling surface (SURVEY.md §2.7 — the only data
selection anywhere is the bad-record filter, SparkStructuredController.scala:72).
A 100 TB training pipeline needs sampling that is:

  (a) **reproducible** — `df.sample()` draws from Spark's per-partition RNG,
      so the picked rows change whenever partitioning changes (repartition,
      AQE coalesce, a different cluster size). A sample that shifts under
      re-execution poisons dedup caches and train/eval splits.
  (b) **pushable** — the gate must be a plain scan predicate so sampled
      pipelines read less, not filter after a full materialization.
  (c) **stratifiable / splittable** — per-source rates (mixture weighting)
      and disjoint train/valid/test assignment from one hash draw.

Hash-gate sampling gives all three: keep a row iff

    portable_hash64(key, seed) % DENOM  <  rate * DENOM

The gate is a codegen'd column expression (md5 + conv — no Python, no
shuffle, evaluates map-side at the scan), and the 60-bit hash is
bit-identical in ANSI SQL (functions/hashing.py), so every sample is
oracle-checkable. Different `seed`s give independent draws; one seed gives
consistent membership across tables sharing the key domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: gate resolution: rates are expressed in basis points (1/10_000).
DENOM = 10_000


def hash_gate(key: Column | str, seed: int = 0) -> Column:
    """Uniform pseudo-random draw in [0, DENOM) from a key column.

    The key is cast to string first so int64 and string keys hash the same
    way as the SQL twin (DuckDB ``CAST(x AS VARCHAR)``).
    """
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash64(c.cast("string"), seed=seed) % F.lit(DENOM)


def hash_gate_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`hash_gate`. ``expr`` must already be VARCHAR
    (wrap integer keys in ``CAST(... AS VARCHAR)``)."""
    return f"({portable_hash64_sql(expr, seed)} % {DENOM})"


def _bp(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * DENOM))


def bernoulli_sample(
    df: DataFrame, key: str, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic ~``rate`` sample: row kept iff its hash gate falls
    below ``rate * DENOM``. Same key + seed ⇒ same membership, on any
    cluster, any partitioning, any engine."""
    return df.where(hash_gate(key, seed) < F.lit(_bp(rate)))


def stratified_sample(
    df: DataFrame,
    strata: str,
    key: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum rates (mixture weighting over data sources): the gate is
    compared against a threshold chosen by the stratum column. The threshold
    map is a literal when-chain — still a single map-side predicate, no join.
    Strata absent from ``rates`` fall back to ``default_rate``."""
    thr: Column = F.lit(_bp(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata) == F.lit(value), F.lit(_bp(rate))).otherwise(thr)
    return df.where(hash_gate(key, seed) < thr)


def stratified_threshold_sql(
    strata_expr: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """DuckDB twin of the stratified threshold when-chain."""
    whens = " ".join(
        f"WHEN {strata_expr} = '{v}' THEN {_bp(r)}"
        for v, r in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE {_bp(default_rate)} END)"


def assign_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive dataset split (train/valid/test) from one hash
    draw: cumulative weight thresholds partition [0, DENOM). Weights must sum
    to 1. Insertion order of ``weights`` fixes the interval layout, so
    growing one split later (e.g. train 0.8→0.9) keeps earlier intervals'
    membership stable for rows already below their threshold."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    g = hash_gate(key, seed)
    expr: Column | None = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        cond = g < F.lit(min(_bp(cum), DENOM))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assert expr is not None
    return df.withColumn(split_col, expr)


def assign_split_sql(key_expr: str, weights: dict[str, float], seed: int = 0) -> str:
    """DuckDB twin of :func:`assign_split` (a CASE over the same gate)."""
    g = hash_gate_sql(key_expr, seed)
    cum, whens = 0.0, []
    for name, w in weights.items():
        cum += w
        whens.append(f"WHEN {g} < {min(_bp(cum), DENOM)} THEN '{name}'")
    return "(CASE " + " ".join(whens) + " END)"


def bottomk_sample(df: DataFrame, key: str, k: int, seed: int = 0) -> DataFrame:
    """Fixed-size uniform k-sample: the k rows with the smallest key hashes
    — the deterministic equivalent of reservoir sampling (same membership on
    any engine / partitioning / pass count), and mergeable: the bottom-k of
    shard bottom-ks is the global bottom-k.

    Output: (key, rank) with rank 1..k in hash order. Plan shape: Spark
    compiles orderBy+limit to TakeOrderedAndProject — per-partition top-k
    then a k-row merge, never a global sort; the final rank window runs on
    k rows."""
    from pyspark.sql import Window

    h = portable_hash64(F.col(key).cast("string"), seed)
    top = df.select(key).withColumn("_h", h).orderBy("_h", key).limit(k)
    w = Window.orderBy("_h", key)
    return top.select(key, F.row_number().over(w).alias("rank"))


def bottomk_sample_sql(table: str, key_expr: str, k: int, seed: int = 0) -> str:
    """DuckDB twin of :func:`bottomk_sample`."""
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return f"""
SELECT {key_expr}, CAST(rank AS INT) AS rank FROM (
  SELECT {key_expr}, row_number() OVER (ORDER BY {h}, {key_expr}) AS rank
    FROM {table}
) WHERE rank <= {k}
"""


#: 60-bit hash range (portable_hash64 = 15 hex digits).
_HASH_RANGE = float(1 << 60)


def weighted_bottomk_sample(
    df: DataFrame, key: str, weight_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Fixed-size WEIGHTED k-sample without replacement — the
    Efraimidis-Spirakis A-ES scheme, derandomized: row r draws
    u = uniform(0,1) from its key hash and gets priority -ln(u)/w(r); the
    k smallest priorities are the sample, so inclusion probability rises
    with weight while membership stays deterministic,
    partitioning-invariant, and mergeable (the bottom-k of shard bottom-ks
    is the global bottom-k — same law as bottomk_sample).

    Output: (key, weight, rank). The float priority itself is NOT output:
    selection and rank only, so an engine's last-ulp ln() difference
    (~1e-16 relative) cannot surface in values — adjacent priorities from
    60-bit hashes are ~1e-5 apart. Plan shape: TakeOrderedAndProject
    (per-partition top-k + k-row merge, never a global sort)."""
    from pyspark.sql import Window

    u = (portable_hash64(F.col(key).cast("string"), seed) + F.lit(0.5)) / F.lit(
        _HASH_RANGE
    )
    pri = -F.log(u) / F.col(weight_col).cast("double")
    top = (
        df.select(key, weight_col)
        .where(F.col(weight_col) > 0)
        .withColumn("_p", pri)
        .orderBy("_p", key)
        .limit(k)
    )
    w = Window.orderBy("_p", key)
    return top.select(key, weight_col, F.row_number().over(w).alias("rank"))


def weighted_bottomk_sample_sql(
    table: str, key_expr: str, weight_expr: str, k: int, seed: int = 0
) -> str:
    """DuckDB twin of :func:`weighted_bottomk_sample`."""
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    pri = f"(-ln(({h} + 0.5) / {_HASH_RANGE!r}) / CAST({weight_expr} AS DOUBLE))"
    return f"""
SELECT {key_expr}, {weight_expr}, CAST(rank AS INT) AS rank FROM (
  SELECT {key_expr}, {weight_expr},
         row_number() OVER (ORDER BY {pri}, {key_expr}) AS rank
    FROM {table} WHERE {weight_expr} > 0
) WHERE rank <= {k}
"""


def rebalance_mixture(
    df: DataFrame,
    strata: str,
    key: str,
    targets: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Source-mixture rebalancing — the data-recipe op of a pretraining
    pipeline: down-sample each stratum so the kept corpus approaches the
    ``targets`` share layout. Per-stratum acceptance is exact integer
    arithmetic (thr_s = min(DENOM, target_bp * N // n_s)), so membership is
    engine-reproducible; strata already below target keep everything (no
    up-sampling — duplication is a separate, explicit op).

    Fully declarative: stratum counts + the corpus total come from one
    aggregation each, the (tiny) threshold table broadcast-joins back, the
    gate is the same map-side hash predicate as bernoulli_sample. No
    driver-side counts.

    Returns the kept rows (all original columns).
    """
    tbp: Column = F.lit(0)
    for value, share in sorted(targets.items()):
        tbp = F.when(F.col(strata) == F.lit(value), F.lit(_bp(share))).otherwise(tbp)
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("_n_s"))
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    thresholds = (
        counts.withColumn("_tbp", tbp)
        .crossJoin(F.broadcast(total))
        .select(strata, F.least(F.lit(DENOM), F.expr("_tbp * _n div _n_s")).alias("_thr"))
    )
    gated = df.join(F.broadcast(thresholds), strata).where(
        hash_gate(key, seed) < F.col("_thr")
    )
    return gated.drop("_thr")


def rebalance_thresholds_sql(
    table: str, strata: str, targets: dict[str, float]
) -> str:
    """DuckDB twin of the threshold table in :func:`rebalance_mixture`."""
    whens = " ".join(
        f"WHEN {strata} = '{v}' THEN {_bp(s)}" for v, s in sorted(targets.items())
    )
    return f"""
SELECT {strata}, n_s,
       least({DENOM}, (CASE {whens} ELSE 0 END) * n // n_s) AS thr
  FROM (SELECT {strata}, count(*) AS n_s FROM {table} GROUP BY {strata})
       CROSS JOIN (SELECT count(*) AS n FROM {table})
"""


def shard_assignment(
    df: DataFrame, key: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data writers:
    every row gets a shard (hash mod n_shards) and a position within its
    shard (rank of the hash, key as tiebreaker) — a reproducible random
    permutation of the corpus into n_shards ordered output files, the last
    step before writing training shards.

    Shape: one map-side hash, one exchange on ``shard`` for the rank window
    — at 100 TB this IS the write repartition the shard files need anyway
    (``partitionBy(shard)``, one sorted file per shard), so the operator
    adds no shuffle beyond the output layout itself. Seed changes produce an
    independent permutation; rows never move between epochs with the same
    seed (resumable writes).
    """
    from pyspark.sql import Window

    h = portable_hash64(F.col(key).cast("string"), seed)
    with_shard = df.select(key).withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key)
    return with_shard.select(
        key, "shard", F.row_number().over(w).alias("pos")
    )


def shard_assignment_sql(
    table: str, key_expr: str, n_shards: int, seed: int = 0
) -> str:
    """DuckDB twin of :func:`shard_assignment`."""
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return f"""
SELECT {key_expr}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, {key_expr}) AS INT)
           AS pos
  FROM (SELECT {key_expr}, {h} AS h, CAST({h} % {n_shards} AS INT) AS shard
          FROM {table})
"""


def temperature_mix(
    df: DataFrame,
    strata: str,
    key: str,
    budget_frac_den: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based domain mixing (the LLM data-mixing primitive:
    sample source s with probability ∝ n_s^α, α = 1/2): per-source accept
    rate r_s = T·√n_s / (Σ√n · n_s), where T = n_total div
    ``budget_frac_den`` is the integer token budget. Low-resource sources
    are upsampled relative to proportional mixing (r_s ∝ 1/√n_s), the
    α→1 limit is proportional and α→0 uniform-per-source.

    Engine-exactness discipline: α is fixed at 1/2 BECAUSE sqrt is
    IEEE-correctly-rounded in both engines where a general pow() is libm
    (the bigram/Benford rule); Σ√n_s is an ORDER-FIXED running-sum fold
    over sources (window ORDER BY source, total = max) so the few-term
    float sum cannot differ by engine reduction order; the rate is
    snapped to integer BASIS POINTS with the repo's double-round idiom
    and the per-row decision is an INTEGER compare of the portable hash
    gate — membership cannot flip on a float ulp. Returns per-source
    (source, n_s, thr_bp, n_sampled); zero-rate sources report 0.

    Scale shape: one count aggregate (source-cardinality output), rates
    broadcast back, the gate is a map-side predicate — the fact table
    shuffles once for the final per-source count, nothing else."""
    rows = df.select(F.col(strata).alias("source"), F.col(key).alias("_k"))
    counts = rows.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "source", "n_s",
        F.sum(F.sqrt(F.col("n_s").cast("double"))).over(w).alias("cw"),
    )
    tot = cum.agg(
        F.max("cw").alias("total_w"), F.sum("n_s").alias("n_total")
    )
    rates = cum.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.expr(
            f"CAST(round(round(least(1.0,"
            f" CAST(n_total div {budget_frac_den} AS DOUBLE)"
            f" * sqrt(CAST(n_s AS DOUBLE))"
            f" / (total_w * CAST(n_s AS DOUBLE))), 6) * {DENOM}, 0)"
            f" AS BIGINT)"
        ).alias("thr_bp"),
    )
    sampled = (
        rows.join(F.broadcast(rates), "source")
        .where(hash_gate("_k", seed) < F.col("thr_bp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source", "n_s", "thr_bp",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )


def temperature_mix_sql(
    table: str,
    strata_expr: str,
    key_expr: str,
    budget_frac_den: int = 5,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`temperature_mix` — identical order-fixed
    weight fold, identical basis-point snap, identical integer gate."""
    gate = hash_gate_sql("CAST(t.k AS VARCHAR)", seed)
    return f"""
WITH rows_t AS (
  SELECT {strata_expr} AS source, {key_expr} AS k FROM {table}
),
counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM rows_t GROUP BY source
),
cum AS (
  SELECT source, n_s,
         sum(sqrt(CAST(n_s AS DOUBLE)))
           OVER (ORDER BY source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM counts
),
tot AS (
  SELECT max(cw) AS total_w, CAST(sum(n_s) AS BIGINT) AS n_total FROM cum
),
rates AS (
  SELECT source, n_s,
         CAST(round(round(least(1.0,
              CAST(n_total // {budget_frac_den} AS DOUBLE)
              * sqrt(CAST(n_s AS DOUBLE))
              / (total_w * CAST(n_s AS DOUBLE))), 6) * {DENOM}, 0)
              AS BIGINT) AS thr_bp
  FROM cum CROSS JOIN tot
),
sampled AS (
  SELECT r.source, CAST(count(*) AS BIGINT) AS n_sampled
  FROM rows_t t JOIN rates r ON t.source = r.source
  WHERE {gate} < r.thr_bp
  GROUP BY r.source
)
SELECT r.source, r.n_s, r.thr_bp,
       COALESCE(s.n_sampled, CAST(0 AS BIGINT)) AS n_sampled
FROM rates r LEFT JOIN sampled s ON s.source = r.source
"""
