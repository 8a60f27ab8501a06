"""Partition pruning audits: static pruning from a literal predicate and
dynamic partition pruning (DPP) from a filtered-dimension join — the two
mechanisms that let a 100 TB date/key-partitioned table read only the slices
a query touches (SCALE.md design rule 3 / SURVEY §4.2 row 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.plans.audit import audit_plan, explain_str


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pp") / "events_by_day")
    (
        spark.range(10_000)
        .select(
            F.col("id"),
            (F.col("id") % 10).alias("day"),
            (F.col("id") % 97).alias("user_id"),
        )
        .write.partitionBy("day")
        .parquet(d)
    )
    return d


def test_static_partition_pruning(spark, part_dir):
    df = spark.read.parquet(part_dir).where("day = 3").select("id")
    a = audit_plan(df, execute=True)
    raw = a.raw
    # the scan must carry a partition filter on `day` — that filter is what
    # skips 9 of the 10 day= directories at listing time (df.inputFiles()
    # reports the unpruned relation listing, so the plan is the contract)
    assert "PartitionFilters" in raw and "day" in raw.split("PartitionFilters", 1)[1][:200]
    assert df.count() == 1_000
    # physical proof: scanning the single directory yields the same result
    assert spark.read.parquet(f"{part_dir}/day=3").count() == 1_000


def test_dynamic_partition_pruning_from_dim_filter(spark, part_dir):
    # DPP: the fact side is partitioned on the join key; the dim filter is
    # only known at runtime — the scan must carry a dynamicpruning subquery,
    # not read all partitions.
    fact = spark.read.parquet(part_dir)
    dim = spark.range(10).select(
        F.col("id").alias("day"), (F.col("id") % 2 == 0).alias("keep")
    )
    joined = fact.join(dim, "day").where("keep").select("user_id")
    plan = explain_str(joined, "formatted").lower()
    assert "dynamicpruning" in plan, plan[:2000]
    assert joined.count() == 5_000  # days 0,2,4,6,8


def test_unpruned_control_reads_all_partitions(spark, part_dir):
    df = spark.read.parquet(part_dir).select("id")
    df.count()
    days = {f.split("day=")[1].split("/")[0] for f in df.inputFiles()}
    assert len(days) == 10
