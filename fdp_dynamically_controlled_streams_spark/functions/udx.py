"""User-defined extension surface: pandas UDAF + Python UDTF (SURVEY §2.7
"UDF/UDAF/UDTF" row; the reference's only UDFs are the two scalar
deserializers, SparkStructuredController.scala:38-39).

These demonstrate the engine's sanctioned slow-path tiers:
  * scalar work        -> built-in exprs first, else Arrow pandas_udf
                          (functions/protowire.py is the in-repo example)
  * custom aggregation -> pandas_udf GROUPED_AGG (Arrow batch per group-
                          partition; partial aggregation is NOT available to
                          Python aggs, so the group's values ship to one
                          task — keep custom UDAFs off the hottest paths or
                          re-express as built-in combinations when possible)
  * row -> many rows   -> Python UDTF (Spark 3.5+), lateral-joined per row

Each has an oracle-checkable catalog entry (queries.py §9b) proving exact
semantics against DuckDB.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


# returnType as DataType instances, not DDL strings: string forms are parsed
# through the JVM at decoration time, which breaks import before a session
# exists (pytest collection).
@pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:  # GROUPED_AGG by usage
    """Geometric mean of positive values; null on empty/no-positive groups.
    Equivalent SQL: exp(avg(ln(v))) FILTER (v > 0)."""
    pos = v[v > 0]
    if len(pos) == 0:
        return None
    import numpy as np

    return float(math.exp(np.log(pos.astype("float64")).mean()))


@udtf(
    returnType=T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("cnt", T.IntegerType()),
        ]
    )
)
class TokenCounts:
    """Per-row token frequency expansion: one input text -> (token, cnt)
    rows. The UDTF form of the tokenize step (text analysis charter op);
    called via LATERAL join so Catalyst parallelizes per input partition."""

    def eval(self, text: str):
        if text is None:
            return
        counts: dict[str, int] = {}
        for tok in text.split():
            counts[tok] = counts.get(tok, 0) + 1
        for tok in sorted(counts):
            yield tok, counts[tok]


def register_udtfs(spark) -> None:
    """Idempotently register the UDTF surface for SQL use."""
    spark.udtf.register("token_counts", TokenCounts)
