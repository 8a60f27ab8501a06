"""PII scrubbing + normalization unit cases (crafted strings — the catalog
query exercises the same path over documents with injected PII)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fdp_dynamically_controlled_streams_spark.operators.textnorm import (
    normalize_text,
    scrub_pii,
)


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r.c for r in df.select(scrub_pii("t").alias("c")).collect()]


def test_scrub_each_pattern(spark):
    got = _run(
        spark,
        [
            "mail me at jane.doe+spam@sub.example.co.uk today",
            "see https://example.com/a/b?q=1&x=2#frag for details",
            "server at 192.168.001.7 responded",
            "call 555-012-3456 or 555 867 5309 now",
        ],
    )
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "see <URL> for details"
    assert got[2] == "server at <IP> responded"
    assert got[3] == "call <PHONE> or <PHONE> now"


def test_scrub_order_url_wins_over_parts(spark):
    # the URL is consumed whole — its digits/dots must not re-match as IP/phone
    got = _run(spark, ["go http://10.0.0.7/p?tel=555-012-3456 end"])
    assert got[0] == "go <URL> end"


def test_normalize(spark):
    df = spark.createDataFrame([("  MiXeD\t\tCase\x01 text  ",)], "t string")
    assert (
        df.select(normalize_text("t").alias("c")).collect()[0].c == "mixed case text"
    )


def test_scrub_leaves_clean_text_alone(spark):
    clean = "plain words with numbers 42 and v1.2 inline"
    assert _run(spark, [clean]) == [clean]
