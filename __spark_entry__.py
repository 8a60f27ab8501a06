"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the reference's canonical
dynamically-controlled-streams query, batch twin) on sf0.001.
``queries()``/``oracle_sql()`` expose the full operator catalog
(fdp_dynamically_controlled_streams_spark/queries.py) — one entry per
implemented operator from SURVEY.md §2, each with its DuckDB-oracle SQL twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fdp_dynamically_controlled_streams_spark.queries import (  # noqa: E402
    oracle_queries,
    spark_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # Testdata parquet carries TIMESTAMP(NANOS); see session.ENGINE_CONF.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_conf(spark)
    return spark_queries()["controller_emit_on_change"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in spark_queries().items():

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _ensure_nanos_conf(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return oracle_queries()
