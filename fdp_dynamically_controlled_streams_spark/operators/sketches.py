"""Distinct-count sketching: KMV (k-minimum-values / bottom-k).

Spark ships HLL++ (`approx_count_distinct`), but its register layout is
engine-internal — the DuckDB oracle cannot reproduce its estimates, so it
can only ever get a rows-only check. KMV (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream") is the sketch that IS cross-engine
reproducible: hash every value, keep the k smallest **distinct** hashes per
group; with fewer than k distinct values the count is exact, otherwise

    estimate = (k - 1) * SPACE / h_(k)

where h_(k) is the k-th smallest hash and SPACE the hash range (2^60 for the
portable md5-derived hash, functions/hashing.py). Deterministic given the
hash function ⇒ the estimate hash-matches the SQL twin bit-for-bit, standard
error ≈ 1/sqrt(k-2) (~13% at k=64).

Scale shape: one `distinct` (map-side partial dedup, then a shuffle on
(group, hash)) followed by one per-group window over the *deduped* hash set.
The window sorts only distinct hashes, not raw rows — for a group with 10^9
raw rows but 10^6 distinct values, the sort input is the 10^6. For groups
whose distinct-set itself is huge, cap the sort by pre-filtering with a
hash ceiling (keep h < SPACE * oversample_k / est_lower_bound) before the
window — the bottom-k survives any such ceiling that admits ≥ k hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: range of the portable 60-bit hash.
SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group exact distinct count AND its KMV estimate, side by side.

    Output: group_cols + (n_exact, kmv_estimate, rel_err). ``n_exact`` is
    the count of distinct 60-bit hashes — identical to the oracle's, and
    equal to the true distinct count up to md5 collisions (~n²/2^61,
    negligible and, crucially, *the same* in both engines).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    hashes = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = hashes.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("_kth"),
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * (F.lit(float(SPACE)) / F.col("_kth"))))
    return (
        agg.withColumn("kmv_estimate", est)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact")) / F.col("n_exact"), 6
            ),
        )
        .drop("_kth")
    )


#: HLL geometry: 2^8 registers over the 60-bit portable hash -> 52 rank bits.
HLL_B = 8
HLL_M = 1 << HLL_B
_HLL_REST_BITS = 60 - HLL_B  # 52
_HLL_MAX_RANK = _HLL_REST_BITS + 1  # 53
#: alpha_m * m^2 * 2^53 — folded to ONE double literal in Python so neither
#: engine does any constant arithmetic (their folding orders could differ).
_HLL_NUM = repr((0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << _HLL_MAX_RANK))


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate (raw estimator) next to the
    exact count — the fixed-size (m=256 registers), mergeable counterpart of
    :func:`kmv_distinct`.

    Spark's own ``approx_count_distinct`` is HLL++ with engine-internal
    registers (never cross-engine checkable); this one is built from the
    portable hash so DuckDB replays the registers bit-for-bit:

      bucket = h mod m;  rank = (#leading zeros of the remaining 52 bits)+1
      (via binary-string length — exact integer ops, no log2 float edge);
      register M[j] = max rank;  E = alpha_m * m^2 / sum_j 2^(-M[j]).

    The harmonic sum is computed EXACTLY: each 2^(-M) term scales to the
    integer 2^(53-M) (a bit shift), absent registers contribute 2^53, and
    the BIGINT total (<= 256 * 2^53 = 2^61) divides the pre-folded
    numerator in one IEEE division — so the estimate, not just the
    registers, hash-matches the oracle. Raw estimator only (the standard
    small-range linear-counting correction needs ln(), which differs across
    libm builds — documented tradeoff: estimates skew high below ~3m/2
    distinct, exactly as visible in the rel_err column).

    Scale shape: one shuffle to (group, bucket) registers — output is
    m rows per group regardless of input size — then an m-row-per-group
    reduce. The register table is the mergeable artifact: unions of
    shards combine by max(M) before the final sum."""
    h = portable_hash64(F.col(value_col).cast("string"))
    hashed = df.select(*group_cols, h.alias("h"))
    rest = F.shiftright("h", HLL_B)
    rank = F.when(rest == 0, F.lit(_HLL_MAX_RANK)).otherwise(
        F.lit(_HLL_MAX_RANK) - F.length(F.bin(rest))
    )
    regs = (
        hashed.select(
            *group_cols,
            (F.col("h") % HLL_M).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_j"))
    )
    sums = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_MAX_RANK} - m_j)")).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_regs"),
    )
    sum_int = F.col("_s_present") + (F.lit(HLL_M) - F.col("_n_regs")) * F.lit(
        1 << _HLL_MAX_RANK
    ).cast("long")
    exact = hashed.distinct().groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    est = F.round(F.lit(float(_HLL_NUM)) / sum_int)
    return (
        sums.join(exact, group_cols)
        .select(
            *group_cols,
            "n_exact",
            est.alias("hll_estimate"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )


def hll_distinct_sql(
    table: str, group_expr: str, group_alias: str, value_expr: str
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same hash, same registers, same
    exact harmonic sum, same pre-folded numerator literal)."""
    h = portable_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    max_rank = _HLL_MAX_RANK
    big = 1 << max_rank
    return f"""
WITH hashed AS (
  SELECT {group_expr} AS {group_alias}, {h} AS h FROM {table}
), ranked AS (
  SELECT {group_alias}, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_B}) = 0 THEN {max_rank}
              ELSE {max_rank} - length(bin(h >> {HLL_B})) END AS rank
  FROM hashed
), regs AS (
  SELECT {group_alias}, bucket, MAX(rank) AS m_j
  FROM ranked GROUP BY {group_alias}, bucket
), sums AS (
  SELECT {group_alias},
         SUM(1::BIGINT << ({max_rank} - m_j)) AS s_present,
         COUNT(*) AS n_regs
  FROM regs GROUP BY {group_alias}
), exact AS (
  SELECT {group_alias}, COUNT(*) AS n_exact
  FROM (SELECT DISTINCT {group_alias}, h FROM hashed) GROUP BY {group_alias}
)
SELECT s.{group_alias}, e.n_exact,
       round({_HLL_NUM} / CAST(s.s_present + ({HLL_M} - s.n_regs) * {big}::BIGINT
                               AS DOUBLE)) AS hll_estimate,
       round(abs(round({_HLL_NUM} / CAST(s.s_present + ({HLL_M} - s.n_regs) * {big}::BIGINT
                                         AS DOUBLE)) - e.n_exact) / e.n_exact, 6) AS rel_err
FROM sums s JOIN exact e USING ({group_alias})
"""


def kmv_distinct_sql(
    table: str, group_expr: str, group_alias: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same arithmetic)."""
    h = portable_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_expr} AS {group_alias}, {h} AS h FROM {table}
), ranked AS (
  SELECT {group_alias}, h,
         row_number() OVER (PARTITION BY {group_alias} ORDER BY h) AS rk
  FROM hashes
), agg AS (
  SELECT {group_alias},
         COUNT(*) AS n_exact,
         MAX(CASE WHEN rk = {k} THEN h END) AS kth
  FROM ranked GROUP BY {group_alias}
)
SELECT {group_alias}, n_exact,
       CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
            ELSE round({float(k - 1)} * ({float(SPACE)} / kth)) END AS kmv_estimate,
       round(abs(CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
                      ELSE round({float(k - 1)} * ({float(SPACE)} / kth)) END
                 - n_exact) / n_exact, 6) AS rel_err
FROM agg
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): point-frequency estimation
# in d*w fixed counters. Like KMV/HLL above, built on the seeded portable
# hash so the SKETCH AND ITS ESTIMATES replay bit-for-bit in the SQL oracle —
# Spark has no frequency sketch at all (approx_count_distinct is cardinality,
# freqItems gives items without counts).
# ---------------------------------------------------------------------------

CMS_D, CMS_W = 4, 256


def _cms_cells(v: F.Column, d: int, w: int) -> list[F.Column]:
    """The d counter columns of a value: hash_r(v) % w, literal seeds."""
    return [(portable_hash64(v, seed=r) % F.lit(w)) for r in range(d)]


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    top: int = 10,
) -> DataFrame:
    """CMS frequency estimates for the ``top`` most frequent values, next to
    their exact counts: (value, n_exact, cms_estimate, overestimate).

    The one-sided error guarantee is visible in the output: estimate >=
    exact always (collisions only ADD), overflow error <= N*e/w with
    probability 1 - e^-d. Scale shape: the counter build is one shuffle to a
    FIXED d*w-row table (the mergeable partial — shard sketches combine by
    summing counters); estimation broadcasts that table against the probe
    set. Raw rows are never sorted or joined against each other.
    """
    base = df.select(F.col(value_col).cast("string").alias("v"))
    cells = base.select(
        "v",
        F.posexplode(F.array(*_cms_cells(F.col("v"), d, w))).alias("r", "c"),
    )
    counters = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    exact = base.groupBy("v").agg(F.count(F.lit(1)).alias("n_exact"))
    wnd = Window.orderBy(F.desc("n_exact"), F.asc("v"))
    probes = (
        exact.withColumn("_rk", F.row_number().over(wnd))
        .where(F.col("_rk") <= top)
        .drop("_rk")
    )
    probe_cells = probes.select(
        "v",
        "n_exact",
        F.posexplode(F.array(*_cms_cells(F.col("v"), d, w))).alias("r", "c"),
    )
    return (
        probe_cells.join(F.broadcast(counters), ["r", "c"])
        .groupBy("v", "n_exact")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            F.col("v").alias("value"),
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
        )
    )


def cms_heavy_hitters_sql(
    table: str,
    value_expr: str,
    d: int = CMS_D,
    w: int = CMS_W,
    top: int = 10,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters` (same seeded hashes, same
    counters, same min-over-rows estimate)."""
    cell_selects = " UNION ALL ".join(
        f"SELECT v, {r} AS r, {portable_hash64_sql('v', seed=r)} % {w} AS c FROM base"
        for r in range(d)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT v, n_exact, {r} AS r, {portable_hash64_sql('v', seed=r)} % {w} AS c"
        f" FROM probes"
        for r in range(d)
    )
    return f"""
WITH base AS (SELECT CAST({value_expr} AS VARCHAR) AS v FROM {table}),
cells AS ({cell_selects}),
counters AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
exact AS (SELECT v, count(*) AS n_exact FROM base GROUP BY v),
probes AS (
  SELECT v, n_exact FROM (
    SELECT v, n_exact, row_number() OVER (ORDER BY n_exact DESC, v) AS rk
      FROM exact) WHERE rk <= {top}
),
probe_cells AS ({probe_selects})
SELECT pc.v AS value, pc.n_exact,
       min(ct.cnt) AS cms_estimate,
       min(ct.cnt) - pc.n_exact AS overestimate
  FROM probe_cells pc JOIN counters ct ON ct.r = pc.r AND ct.c = pc.c
 GROUP BY pc.v, pc.n_exact
"""


def hll_rollup(
    df: DataFrame, group_col: str, value_col: str, all_label: str = "ALL"
) -> DataFrame:
    """Hierarchical sketch rollup: per-group HLL registers PLUS a total-level
    estimate computed by MERGING the group registers (max per bucket) — never
    by rescanning the raw rows.

    This is the sketch-cube primitive for 100 TB: materialize registers per
    partition grain (day, source, shard), answer any coarser distinct-count
    rollup from the fixed-size register table alone. Merging is exact (max
    is associative/commutative/idempotent), so merge-then-estimate ≡
    estimate-over-union — the entry's oracle replays both levels bit-for-bit.

    Output: one row per group plus one ``all_label`` row, each with
    n_exact / hll_estimate / rel_err (same estimator and exact-integer
    harmonic sum as :func:`hll_distinct`). The raw input is touched exactly
    once (one shuffle to (group, bucket) registers); the rollup level
    reduces the m-registers-per-group table, and the exact counts ride the
    same single deduped shuffle."""
    h = portable_hash64(F.col(value_col).cast("string"))
    hashed = df.select(F.col(group_col).cast("string").alias("g"), h.alias("h"))
    rest = F.shiftright("h", HLL_B)
    rank = F.when(rest == 0, F.lit(_HLL_MAX_RANK)).otherwise(
        F.lit(_HLL_MAX_RANK) - F.length(F.bin(rest))
    )
    ranked = hashed.select(
        "g", (F.col("h") % HLL_M).alias("bucket"), rank.alias("rank"), "h"
    )
    regs = ranked.groupBy("g", "bucket").agg(F.max("rank").alias("m_j"))
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit(all_label).alias("g"), "bucket", "m_j")
    )
    all_regs = regs.unionByName(merged)
    sums = all_regs.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_MAX_RANK} - m_j)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    sum_int = F.col("_s") + (F.lit(HLL_M) - F.col("_n")) * F.lit(
        1 << _HLL_MAX_RANK
    ).cast("long")
    dedup = hashed.distinct()
    exact_g = dedup.groupBy("g").agg(F.count(F.lit(1)).alias("n_exact"))
    exact_all = (
        dedup.select("h")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .select(F.lit(all_label).alias("g"), "n_exact")
    )
    exact = exact_g.unionByName(exact_all)
    est = F.round(F.lit(float(_HLL_NUM)) / sum_int)
    return sums.join(exact, "g").select(
        F.col("g").alias(group_col),
        "n_exact",
        est.alias("hll_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


def hll_rollup_sql(
    table: str, group_expr: str, group_alias: str, value_expr: str,
    all_label: str = "ALL",
) -> str:
    """DuckDB twin of :func:`hll_rollup` (same registers, same merge level,
    same exact harmonic sum)."""
    h = portable_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    max_rank = _HLL_MAX_RANK
    big = 1 << max_rank
    return f"""
WITH hashed AS (
  SELECT CAST({group_expr} AS VARCHAR) AS g, {h} AS h FROM {table}
), ranked AS (
  SELECT g, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_B}) = 0 THEN {max_rank}
              ELSE {max_rank} - length(bin(h >> {HLL_B})) END AS rank, h
  FROM hashed
), regs AS (
  SELECT g, bucket, MAX(rank) AS m_j FROM ranked GROUP BY g, bucket
), merged AS (
  SELECT '{all_label}' AS g, bucket, MAX(m_j) AS m_j FROM regs GROUP BY bucket
), all_regs AS (
  SELECT * FROM regs UNION ALL SELECT * FROM merged
), sums AS (
  SELECT g, SUM(1::BIGINT << ({max_rank} - m_j)) AS s_present,
         COUNT(*) AS n_regs
  FROM all_regs GROUP BY g
), dedup AS (SELECT DISTINCT g, h FROM hashed),
exact AS (
  SELECT g, COUNT(*) AS n_exact FROM dedup GROUP BY g
  UNION ALL
  SELECT '{all_label}', COUNT(DISTINCT h) FROM dedup
)
SELECT s.g AS {group_alias}, e.n_exact,
       round({_HLL_NUM} / CAST(s.s_present + ({HLL_M} - s.n_regs) * {big}::BIGINT
                               AS DOUBLE)) AS hll_estimate,
       round(abs(round({_HLL_NUM} / CAST(s.s_present + ({HLL_M} - s.n_regs) * {big}::BIGINT
                                         AS DOUBLE)) - e.n_exact) / e.n_exact, 6) AS rel_err
FROM sums s JOIN exact e USING (g)
"""


def kmv_overlap(
    a: DataFrame, b: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """Theta-sketch set operations: estimate |A ∩ B| and |A ∪ B| from two
    bottom-k hash sketches WITHOUT ever joining the raw sets — the
    audience-overlap primitive (Dasgupta et al., "Theta-Sketch Framework").

    θ = min(k-th smallest hash of A, of B); every hash below θ from either
    side is a uniform sample of A ∪ B at rate θ/2^60, so

        |A ∪ B| ≈ |{h < θ}| · 2^60/θ      |A ∩ B| ≈ |{h < θ on BOTH sides}| · 2^60/θ

    Fully deterministic given the portable hash ⇒ the estimates hash-match
    the SQL twin. Sides with < k distinct values give θ = 2^60 and the
    estimates collapse to exact counts. Exact values are computed alongside
    (affordable at test SF — the point of the sketch is that at 100 TB you
    would NOT: two 256-row sketches answer the overlap question that would
    otherwise cost a full distinct-join of both sets).

    Scale shape: one distinct + one bottom-k window per side (the same
    deduped-shuffle shape as kmv_distinct); everything after operates on
    ≤ 2k rows, broadcast throughout. Returns ONE row:
    (n_exact_inter, inter_estimate, rel_err_inter,
     n_exact_union, union_estimate, rel_err_union)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = portable_hash64(F.col(value_col).cast("string"))
    ha = a.select(F.lit("a").alias("s"), h.alias("h")).distinct()
    hb = b.select(F.lit("b").alias("s"), h.alias("h")).distinct()
    u = ha.unionByName(hb)
    w = Window.partitionBy("s").orderBy("h")
    ranked = u.withColumn("rk", F.row_number().over(w))
    theta = (
        ranked.groupBy("s")
        .agg(F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"))
        .agg(F.min(F.coalesce("kth", F.lit(SPACE))).alias("theta"))
    )
    below = ranked.crossJoin(F.broadcast(theta)).where(
        F.col("h") < F.col("theta")
    )
    nb = below.select("h").distinct().agg(F.count(F.lit(1)).alias("nb"))
    nc = (
        below.groupBy("h")
        .agg(F.count(F.lit(1)).alias("ns"))
        .where(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    xu = u.select("h").distinct().agg(F.count(F.lit(1)).alias("xu"))
    xi = (
        u.groupBy("h")
        .agg(F.count(F.lit(1)).alias("ns"))
        .where(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).alias("xi"))
    )
    row = (
        xi.crossJoin(F.broadcast(xu))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(theta))
    )
    space_d = F.lit(float(SPACE))

    def est(n):
        return F.round(F.col(n).cast("double") * space_d / F.col("theta"))

    def rel(e, x):
        return F.when(
            F.col(x) > 0, F.round(F.abs(e - F.col(x)) / F.col(x), 6)
        )

    return row.select(
        F.col("xi").alias("n_exact_inter"),
        est("nc").alias("inter_estimate"),
        rel(est("nc"), "xi").alias("rel_err_inter"),
        F.col("xu").alias("n_exact_union"),
        est("nb").alias("union_estimate"),
        rel(est("nb"), "xu").alias("rel_err_union"),
    )


def kmv_overlap_sql(a_sql: str, b_sql: str, value_expr: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_overlap`. ``a_sql``/``b_sql`` are SELECTs
    producing the raw value rows; ``value_expr`` names the value column."""
    h = portable_hash64_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH ha AS (SELECT DISTINCT 'a' AS s, {h} AS h FROM ({a_sql})),
hb AS (SELECT DISTINCT 'b' AS s, {h} AS h FROM ({b_sql})),
u AS (SELECT * FROM ha UNION ALL SELECT * FROM hb),
ranked AS (SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rk FROM u),
kth AS (SELECT s, max(CASE WHEN rk = {k} THEN h END) AS kth FROM ranked GROUP BY s),
theta AS (SELECT min(coalesce(kth, {SPACE})) AS theta FROM kth),
below AS (SELECT s, h FROM ranked CROSS JOIN theta WHERE h < theta),
nb AS (SELECT count(DISTINCT h) AS nb FROM below),
nc AS (SELECT count(*) AS nc FROM (SELECT h FROM below GROUP BY h HAVING count(*) = 2)),
xu AS (SELECT count(DISTINCT h) AS xu FROM u),
xi AS (SELECT count(*) AS xi FROM (SELECT h FROM u GROUP BY h HAVING count(*) = 2))
SELECT xi.xi AS n_exact_inter,
       round(CAST(nc.nc AS DOUBLE) * CAST({SPACE} AS DOUBLE) / theta.theta)
         AS inter_estimate,
       CASE WHEN xi.xi > 0 THEN
         round(abs(round(CAST(nc.nc AS DOUBLE) * CAST({SPACE} AS DOUBLE) / theta.theta)
                   - xi.xi) / xi.xi, 6) END AS rel_err_inter,
       xu.xu AS n_exact_union,
       round(CAST(nb.nb AS DOUBLE) * CAST({SPACE} AS DOUBLE) / theta.theta)
         AS union_estimate,
       CASE WHEN xu.xu > 0 THEN
         round(abs(round(CAST(nb.nb AS DOUBLE) * CAST({SPACE} AS DOUBLE) / theta.theta)
                   - xu.xu) / xu.xu, 6) END AS rel_err_union
  FROM xi CROSS JOIN xu CROSS JOIN nc CROSS JOIN nb CROSS JOIN theta
"""


# ---------------------------------------------------------------- HDR
# log-linear quantile histogram (HdrHistogram, Gil Tene): buckets are
# powers of two split into 2^sub_bits linear sub-buckets — PURE INTEGER
# math end-to-end. floor(log2(cents)) = length(bin(cents)) - 1 in BOTH
# engines (no libm log anywhere — a ceil(ln(x)/ln(γ)) DDSketch-style
# index would flip buckets on cross-libm last-ulp differences, the exact
# failure mode the repo's bigram/Benford notes document), so the sketch
# is deterministic and value-hashes against the SQL twin.


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple = (("p50", 1, 2), ("p90", 9, 10),
                        ("p99", 99, 100), ("p999", 999, 1000)),
    sub_bits: int = 4,
) -> DataFrame:
    """Mergeable approximate quantiles from a log-linear integer histogram
    (HdrHistogram shape): one scan builds ≤ 64·2^sub_bits bucket counts
    (map-side combined — the ONLY shuffle is output-sized), the quantile
    is the lower bound of the first bucket whose cumulative count reaches
    ceil(q·n). Relative error ≤ 2^-sub_bits by construction (bucket width
    / lower bound), estimates never exceed the true quantile (lower-bound
    selection) — both law-tested. Counts are plain integers, so sketches
    MERGE by addition (per-partition, per-day, per-source rollups at
    100 TB cost one small combine instead of a global sort; the exact
    alternative, operators/histogram.py::exact_quantiles, pays a
    bucket-count pass per refinement level). Ranks are computed as
    (num·n + den − 1) div den — exact rational ceil, no float q·n.

    POSITIVE DOMAIN ONLY: rows whose value rounds below one cent
    (zeros, negatives, |v| < 0.005) are excluded before bucketing —
    the log-linear index needs cents >= 1 — so ``n`` and every rank
    cover the positive subset, exactly as HdrHistogram's lowest
    trackable value does. Callers sketching a column that may contain
    such rows should count them separately if the fraction matters
    (the SQL twin applies the identical cents >= 1 filter, so the
    restriction never breaks the value hash).
    Returns (q, rank, estimate_cents)."""
    counts = hdr_bucket_rows(df, value_col, sub_bits).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return hdr_quantiles_from_counts(counts, quantiles, sub_bits)


def hdr_bucket_rows(
    df: DataFrame, value_col: str, sub_bits: int = 4
) -> DataFrame:
    """Per-row log-linear bucket index (the map-side projection the batch
    AND streaming sketches share): one `bucket` bigint column."""
    s = 1 << sub_bits
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    rows = df.select(cents.alias("cents")).where(F.col("cents") >= 1)
    base_sql = ("shiftleft(CAST(1 AS BIGINT),"
                " CAST(length(bin(cents)) - 1 AS INT))")
    bucket = F.expr(
        f"CAST(length(bin(cents)) - 1 AS BIGINT) * {s}"
        f" + ((cents - {base_sql}) * {s}) div {base_sql}"
    )
    return rows.select(bucket.alias("bucket"))


def hdr_quantiles_from_counts(
    counts: DataFrame,
    quantiles: tuple = (("p50", 1, 2), ("p90", 9, 10),
                        ("p99", 99, 100), ("p999", 999, 1000)),
    sub_bits: int = 4,
) -> DataFrame:
    """Quantile selection from an HDR bucket-count table — the stage that
    consumes a MERGED sketch (per-partition, per-day, or streaming-built
    counts all land here; counts merge by addition)."""
    s = 1 << sub_bits
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "bucket", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    n = counts.agg(F.sum("cnt").alias("n"))
    qdf = counts.sparkSession.createDataFrame(
        list(quantiles), "q string, num long, den long"
    )
    ranked = (
        F.broadcast(qdf)
        .crossJoin(F.broadcast(n))
        .select("q", F.expr("(num * n + den - 1) div den").alias("rank"))
    )
    picked = (
        ranked.join(cum, F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank")
        .agg(F.min("bucket").alias("bucket"))
    )
    eb_sql = f"shiftleft(CAST(1 AS BIGINT), CAST(bucket div {s} AS INT))"
    return picked.select(
        "q",
        "rank",
        F.expr(f"{eb_sql} + ((bucket % {s}) * {eb_sql}) div {s}").alias(
            "estimate_cents"
        ),
    )


def hdr_quantiles_sql(
    table: str,
    value_expr: str,
    quantiles: tuple = (("p50", 1, 2), ("p90", 9, 10),
                        ("p99", 99, 100), ("p999", 999, 1000)),
    sub_bits: int = 4,
) -> str:
    """DuckDB twin of :func:`hdr_quantiles` — identical integer bucket
    index (length(bin(cents))-1, << shifts, div), identical rational
    rank, identical lower-bound selection."""
    s = 1 << sub_bits
    qrows = " UNION ALL ".join(
        f"SELECT '{q}' AS q, CAST({num} AS BIGINT) AS num,"
        f" CAST({den} AS BIGINT) AS den"
        for q, num, den in quantiles
    )
    return f"""
WITH cents_t AS (
  SELECT CAST(round({value_expr} * 100) AS BIGINT) AS cents FROM {table}
),
rows_t AS (SELECT cents FROM cents_t WHERE cents >= 1),
bucketed AS (
  SELECT (CAST(length(bin(cents)) - 1 AS BIGINT) * {s})
         + ((cents - (CAST(1 AS BIGINT) << (length(bin(cents)) - 1))) * {s})
           // (CAST(1 AS BIGINT) << (length(bin(cents)) - 1)) AS bucket
  FROM rows_t
),
counts AS (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket),
cum AS (
  SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
),
n_t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
qs AS ({qrows}),
ranked AS (
  SELECT q, CAST((num * n + den - 1) // den AS BIGINT) AS rank
  FROM qs CROSS JOIN n_t
),
picked AS (
  SELECT r.q, r.rank, min(c.bucket) AS bucket
  FROM ranked r JOIN cum c ON c.cum >= r.rank
  GROUP BY r.q, r.rank
)
SELECT q, rank,
       CAST((CAST(1 AS BIGINT) << CAST(bucket // {s} AS INT))
            + ((bucket % {s}) * (CAST(1 AS BIGINT) << CAST(bucket // {s} AS INT)))
              // {s} AS BIGINT) AS estimate_cents
FROM picked
"""
