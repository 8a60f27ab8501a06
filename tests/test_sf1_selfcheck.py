"""sf1 correctness tier — FULL CATALOG (r10 verdict task 1).

History: r5 introduced this tier for the priciest entries (the timing
probe's fixed set, 48 by r10); the r10 full-catalog TRIAL immediately
caught the engine-divergent .xx5 rounding class that sf0.01/sf0.1
structurally could not (the boundary needs ~10^6 addends), proving the
remaining unproven-at-sf1 entries carried real residual risk. Round 11
closes it: the sf1 tier is the ENTIRE catalog against the ``.sfscale/sf1``
shape-preserving 10x replication (~6 M lineitem rows, 1 M events, 500 k
docs), minus individually justified exclusions (currently none).

Slow by construction (an hour+ of Spark + DuckDB at sf1), so it is
gated:  SPARK_GRAFT_SF1_CHECK=1 python -m pytest tests/test_sf1_selfcheck.py
The checked-in CORRECTNESS_SELF_r{N}_sf1.json artifact is produced by
scripts/sf1_full_check.py (resumable, per-entry flush) against the same
dir; the artifact-coverage law in tests/test_docs.py pins it to this
module's SF1_ENTRIES.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from tests.oracle_harness import compare, duck_con
from tests.sf1_probe import SF1

#: Entries excluded from the sf1 tier, each with a one-line justification
#: (the coverage law treats these as documented carve-outs, not gaps).
SF1_EXCLUSIONS: dict[str, str] = {}


def _sf1_entries() -> list[str]:
    from fdp_dynamically_controlled_streams_spark.queries import catalog

    return [n for n in sorted(catalog()) if n not in SF1_EXCLUSIONS]


SF1_ENTRIES = _sf1_entries()

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF1_CHECK"),
    reason="sf1 tier is slow; set SPARK_GRAFT_SF1_CHECK=1 to run "
    "(and build .sfscale/sf1 via tests/sf1_probe.py first)",
)


@pytest.fixture(scope="module")
def duck():
    if not Path(f"{SF1}/lineitem.parquet").exists():
        pytest.skip("sf1 replication absent; run tests/sf1_probe.py to build")
    return duck_con(SF1)


@pytest.mark.parametrize("name", SF1_ENTRIES)
def test_sf1_oracle_parity(spark, duck, name):
    from fdp_dynamically_controlled_streams_spark.queries import catalog

    entry = catalog()[name]
    sdf = entry.fn(spark, SF1).toPandas()
    if entry.oracle is None:
        assert len(sdf) > 0
        return
    odf = duck.execute(entry.oracle).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"
