"""Engine-portable exact HALF_UP ratio rounding (round-11 sweep of the
.xx5 double-rounding class).

The full-catalog sf1 trial (round 10, SCALE.md) proved that
``round(CAST(<exact decimal> AS DOUBLE), s)`` is ENGINE-DIVERGENT at exact
.xx5 decimal boundaries whose nearest double sits BELOW the boundary:
Spark's round goes through the double's shortest decimal string (sees
"0.145" -> HALF_UP -> 0.15) while DuckDB rounds the numeric double
(sees 0.1449999... -> 0.14).  Empirically confirmed members: 0.145,
0.285 at scale 2 (tests/test_oracle_parity.py::
test_raw_double_round_divergence_premise); boundaries whose nearest
double sits above (e.g. 0.435) agree.  Round 10 fixed the decimal-SUM sites by
rounding the DECIMAL before the cast; this module closes the remaining
half of the class — RATIOS of exactly-representable integers (counts,
cents, unscaled decimal sums), where the quotient can terminate with a 5
in the (s+1)-th decimal whenever the denominator is of the form 2^a*5^b*k
with k dividing the numerator.

Contract: ``num``/``den`` are non-negative integer-valued, ``den > 0``.
round(num/den, s) HALF_UP  ==  ((2*num*10^s + den) DIV (2*den)) / 10^s
in EXACT integer arithmetic.  Spark gets exact arithmetic from
DECIMAL(38,0) ops plus an exact-mod floor division; DuckDB from HUGEINT
``//``.  The final ``/10^s`` happens in DOUBLE on both sides: the integer
R is exact in a double (R < 2^53 for any plausible ratio*10^6) and IEEE
division is correctly rounded, so the result bits match.

Law-tested cross-engine on constructed .xx5 boundaries and random ratios
in tests/test_oracle_parity.py::test_dratio_cross_engine_law.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dfloordiv(a: Column, b: Column) -> Column:
    """Exact floor division of two non-negative integer-valued
    DECIMAL(38,0) columns.  ``a % b`` on decimals is EXACT in Spark (no
    scale rounding), so ``(a - a % b)`` is exactly divisible by ``b`` and
    the decimal division produces an exactly-representable integer — no
    rounding ever fires.  (A plain ``F.floor(a / b)`` would be wrong:
    Spark's decimal division rounds the quotient at the result scale,
    which can cross an integer boundary when the true remainder is tiny.)
    """
    return ((a - a % b) / b).cast("decimal(38,0)")


def dratio_unscaled(num: Column, den: Column, scale: int) -> Column:
    """The integer R = round(num/den, scale)*10^scale as DECIMAL(38,0) —
    the exact HALF_UP numerator, for callers that keep summing exactly
    before the final double conversion."""
    p = 10**scale
    a = num.cast("decimal(38,0)") * F.lit(2 * p) + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * F.lit(2)
    return dfloordiv(a, b)


def dratio(num: Column, den: Column, scale: int = 6) -> Column:
    """Exact HALF_UP rounding of num/den at ``scale`` (see module doc)."""
    return dratio_unscaled(num, den, scale).cast("double") / F.lit(
        float(10**scale)
    )


def dratio_signed(num: Column, den: Column, scale: int = 6) -> Column:
    """Like :func:`dratio` but ``num`` may be negative: rounds HALF away
    from zero (both engines' round() semantics for negatives), den > 0.
    A magnitude that rounds to zero stays +0.0 (never -0.0, which could
    format/hash differently downstream)."""
    mag = dratio(F.abs(num), den, scale)
    return F.when((num < 0) & (mag > 0), -mag).otherwise(mag)


#: DuckDB twin of :func:`dratio_unscaled`: R = (2*n*10^s + d) // (2*d) in
#: HUGEINT (exact).
DRATIO_UNSCALED = (
    "((2 * CAST({n} AS HUGEINT) * {p} + CAST({d} AS HUGEINT))"
    " // (2 * CAST({d} AS HUGEINT)))"
)

#: DuckDB twin of :func:`dratio`: the exact integer R, then R/10^s in
#: DOUBLE (both factors exact, division correctly rounded — bit-identical
#: to the Spark side).
DRATIO = "(CAST(" + DRATIO_UNSCALED + " AS DOUBLE) / {p}.0)"


def dratio_unscaled_sql(n: str, d: str, scale: int) -> str:
    """DuckDB SQL fragment for the exact HALF_UP integer numerator."""
    return DRATIO_UNSCALED.format(n=n, d=d, p=10**scale)


def dratio_sql(n: str, d: str, scale: int = 6) -> str:
    """DuckDB SQL fragment for exact HALF_UP rounding of ``n``/``d``."""
    return DRATIO.format(n=n, d=d, p=10**scale)


def dratio_signed_sql(n: str, d: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`dratio_signed` (n may be negative)."""
    mag = DRATIO.format(n=f"abs({n})", d=d, p=10**scale)
    return f"(CASE WHEN ({n}) < 0 AND {mag} > 0 THEN -{mag} ELSE {mag} END)"
