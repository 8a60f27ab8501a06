"""Bucketed-table materialization: the SCALE.md claim that persisted
signature/embedding tables bucket on their join key so repeated dedup/ANN
passes skip the shuffle entirely — proven by plan audit (zero Exchange)."""

from __future__ import annotations

import pytest

from fdp_dynamically_controlled_streams_spark.plans.audit import audit_plan


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/warehouse'"
    )
    yield "bktdb"
    spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_bucketed_join_is_exchange_free(spark, bucket_db):
    left = spark.range(0, 1000).selectExpr("id", "id * 2 AS sig")
    right = spark.range(0, 1000).selectExpr("id", "id % 7 AS label")
    for name, df in [("sigs", left), ("labels", right)]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "id")
            .sortBy("id")
            .saveAsTable(f"{bucket_db}.{name}")
        )

    # force the shuffle-sensitive strategy: no broadcast escape hatch
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{bucket_db}.sigs").join(
            spark.table(f"{bucket_db}.labels"), "id"
        )
        a = audit_plan(joined, execute=True)
        # co-located buckets: a sort-merge join with NO Exchange anywhere
        # (executed AQE explain repeats operators in initial+final sections,
        # so join counts are >=, exchange must be 0 in BOTH)
        assert a.n_exchanges == 0, a.raw
        assert a.n_sortmerge_joins >= 1
        assert joined.count() == 1000

        # control: the same join over non-bucketed inputs must shuffle
        plain = left.join(right, "id")
        b = audit_plan(plain, execute=True)
        assert b.n_exchanges >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
