"""UDAF/UDTF extension-surface unit tests (edge cases beyond the oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.functions.udx import (
    geometric_mean,
    register_udtfs,
)


def test_geometric_mean_ignores_nonpositive_and_handles_empty(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("a", -1.0), ("b", 0.0), ("b", -3.0)],
        "k string, v double",
    )
    got = {
        r.k: r.g
        for r in df.groupBy("k").agg(geometric_mean("v").alias("g")).collect()
    }
    assert got["a"] == 4.0  # sqrt(2*8); -1 ignored
    assert got["b"] is None  # no positive values


def test_udtf_null_text_yields_no_rows(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id int, text string"
    ).createOrReplaceTempView("__udx_docs")
    rows = spark.sql(
        "SELECT d.doc_id, t.token, t.cnt FROM __udx_docs d, "
        "LATERAL token_counts(d.text) t"
    ).collect()
    assert sorted((r.doc_id, r.token, r.cnt) for r in rows) == [
        (1, "a", 2),
        (1, "b", 1),
    ]
