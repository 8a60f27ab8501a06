"""Schema evolution: a 100 TB table accretes columns over its lifetime; the
engine must read old+new files as one frame (missing columns null) without
rewriting history. Two forms: parquet mergeSchema on a mixed directory, and
unionByName(allowMissingColumns) for explicit frames."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fdp_dynamically_controlled_streams_spark.sources.registry import read_batch


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dcs-evo-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_merge_schema_reads_old_and_new_files_as_one_table(spark, tmpdir):
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    old.write.parquet(f"{tmpdir}/t/part=0")
    new.write.parquet(f"{tmpdir}/t/part=1")
    got = read_batch(spark, "parquet", f"{tmpdir}/t", mergeSchema="true")
    assert set(got.columns) == {"id", "name", "score", "part"}
    rows = {r.id: r.score for r in got.collect()}
    assert rows == {1: None, 2: 0.5}  # old files surface the new column as null


def test_union_by_name_fills_missing_columns(spark):
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    u = old.unionByName(new, allowMissingColumns=True)
    assert {r.id: r.score for r in u.collect()} == {1: None, 2: 0.5}
