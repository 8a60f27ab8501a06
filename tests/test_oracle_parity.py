"""Every catalog query vs its DuckDB oracle at sf0.001 (fast CI gate).
The driver runs the same compare at sf0.01; tests/oracle_harness.py replicates
that locally."""

from __future__ import annotations

import pytest

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
