"""Every catalog query vs its DuckDB oracle at sf0.001 (fast CI gate).
The driver runs the same compare at sf0.01; tests/oracle_harness.py replicates
that locally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.queries import catalog
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_con

ENTRIES = [e for e in catalog().values() if e.oracle is not None]
ROWS_ONLY = [e for e in catalog().values() if e.oracle is None]


@pytest.fixture(scope="module")
def oracle():
    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("entry", ENTRIES, ids=[e.name for e in ENTRIES])
def test_query_matches_oracle(spark, oracle, entry):
    sdf = entry.fn(spark, SF_SMOKE).toPandas()
    odf = oracle.execute(entry.oracle).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{entry.name}: {msg}"


@pytest.mark.parametrize("entry", ROWS_ONLY, ids=[e.name for e in ROWS_ONLY])
def test_rows_only_query_runs(spark, entry):
    df = entry.fn(spark, SF_SMOKE)
    assert df.count() >= 0


# ---------------------------------------------------------------------------
# The .xx5 double-rounding law (round-11 sweep, functions/exactround.py).
#
# Proven-divergent class (round-10 full-catalog sf1 trial): for a value
# whose EXACT form is a decimal ending in 5 one digit past the rounding
# scale, `round(CAST(x AS DOUBLE), s)` differs between engines — Spark
# rounds the double's shortest decimal string (HALF_UP on the literal
# ".. 5"), DuckDB multiplies by 10^s (the binary double sits just below
# the .5 mark).  The law: the repo's exact-arithmetic forms (dratio /
# dratio_signed / decimal-rounded sums) are bit-identical across engines
# on (a) every constructed boundary and (b) randomized integer ratios —
# while the test ALSO re-demonstrates the raw-double divergence on the
# same boundaries, so if either engine changes rounding behavior the
# documented premise (not just the fix) is re-checked.
#
# Accepted residual risk (documented, not fixed — no exact form exists):
# F.round on float-ACCUMULATED values (cosine scores, EWMA, CUSUM, PSI,
# OLS, stddev/corr, percentiles).  There the true value is not a short
# decimal, so a shortest-string .5 landing requires the accumulation to
# hit the nearest-double of an exact 7-digit-terminating decimal —
# possible in principle, unobserved across sf0.01/sf0.1/sf1 tiers.  Two
# further classes are engine-SAFE by construction and left as F.round:
# scale-0 integer rounding (an exact .5 double rounds away-from-zero in
# BOTH engines; a non-.5 double has a non-.5 shortest string), and
# ratios with power-of-two denominators (minhash agree/16: exact in
# binary, <= 4 decimal digits, so round-at-6 is the identity).
# ---------------------------------------------------------------------------


def test_dratio_cross_engine_law(spark):
    import duckdb

    from fdp_dynamically_controlled_streams_spark.functions.exactround import (
        dratio,
        dratio_signed,
        dratio_signed_sql,
        dratio_sql,
    )

    # (num, den, scale): every case's exact quotient terminates with a 5
    # at digit scale+1 — the proven-divergent boundary — plus randoms.
    import random

    rng = random.Random(0xD1A70)
    cases = [
        (435, 1000, 2),     # 0.435   -> 0.44
        (865, 2000, 3),     # 0.4325  -> 0.433
        (1234565, 10**7, 6),
        (5, 10, 0),         # 0.5     -> 1
        (15, 10**7, 6),     # 0.0000015 -> 0.000002
        (999999995, 10**9, 6),  # 0.999999995 carries all the way up
        (7, 2, 0),
        (125, 1000, 2),
        (1, 3, 6),          # non-terminating quotient (sanity)
        (2, 7, 4),
    ]
    for _ in range(64):
        s = rng.choice([2, 4, 6])
        den = rng.randrange(1, 10**6)
        num = rng.randrange(0, den * 100)
        cases.append((num, den, s))

    con = duckdb.connect()
    for num, den, s in cases:
        for sign in (1, -1):
            n = sign * num
            got_spark = (
                spark.range(1)
                .select(
                    dratio_signed(
                        F.lit(n).cast("decimal(38,0)"),
                        F.lit(den).cast("decimal(38,0)"),
                        s,
                    ).alias("r")
                )
                .collect()[0]["r"]
            )
            got_duck = con.execute(
                f"SELECT {dratio_signed_sql(str(n), str(den), s)}"
            ).fetchone()[0]
            assert got_spark == got_duck, (n, den, s, got_spark, got_duck)
            if sign == 1:
                g2 = (
                    spark.range(1)
                    .select(
                        dratio(
                            F.lit(n).cast("decimal(38,0)"),
                            F.lit(den).cast("decimal(38,0)"),
                            s,
                        ).alias("r")
                    )
                    .collect()[0]["r"]
                )
                d2 = con.execute(
                    f"SELECT {dratio_sql(str(n), str(den), s)}"
                ).fetchone()[0]
                assert g2 == d2 == got_spark, (n, den, s, g2, d2)
        # exact-arithmetic HALF_UP ground truth (away from zero)
        import fractions

        q = fractions.Fraction(num * 10**s, den)
        r_exact = (q.numerator * 2 + q.denominator) // (2 * q.denominator)
        expect = float(r_exact) / 10**s if s else float(r_exact)
        got = con.execute(
            f"SELECT {dratio_sql(str(num), str(den), s)}"
        ).fetchone()[0]
        assert got == expect, (num, den, s, got, expect)


def test_raw_double_round_divergence_premise(spark):
    """Re-demonstrate the PREMISE on a constructed boundary: rounding the
    nearest-double of 0.435 at scale 2 as a raw double disagrees between
    engines (if an engine version ever changes this, the sweep's rationale
    needs re-review — this test is the tripwire)."""
    import duckdb

    # 0.145's nearest double is strictly BELOW the exact decimal (0.1449…):
    # Spark's shortest-string path sees "0.145" -> HALF_UP -> 0.15, DuckDB's
    # numeric path sees the below-boundary double -> 0.14.  (A boundary whose
    # nearest double sits ABOVE, e.g. 0.435 = 0.43500…033, rounds up in both
    # engines — the divergent members of the class are exactly the
    # below-boundary ones.)
    x = 0.145
    s_val = (
        spark.range(1).select(F.round(F.lit(x), 2).alias("r")).collect()[0]["r"]
    )
    d_val = duckdb.connect().execute("SELECT round(0.145::DOUBLE, 2)").fetchone()[0]
    assert s_val == 0.15 and d_val == 0.14, (s_val, d_val)
