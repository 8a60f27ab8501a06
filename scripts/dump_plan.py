"""Dump .explain('formatted') for catalog entries to files.

Usage: python scripts/dump_plan.py <out_dir> <suffix> <entry> [entry ...]
Writes <out_dir>/<entry>_<suffix>.txt. Plan-only (no job execution) except
entries whose build runs eagerly; sf dir via SPARK_GRAFT_SF_DIR
(default sf0.01 — plan shape, not data scale, is what these files pin).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdp_dynamically_controlled_streams_spark.queries import spark_queries
from fdp_dynamically_controlled_streams_spark.session import get_spark


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dump-plan")
    qs = spark_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = Path(out_dir) / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print("wrote", p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
