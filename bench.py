"""Benchmark harness: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via a count-ish action (collect of the
aggregated result) so scan+shuffle+agg all execute; plans warm one shared
SparkSession (JVM startup excluded from per-query timings).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fdp_dynamically_controlled_streams_spark.queries import spark_queries  # noqa: E402
from fdp_dynamically_controlled_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="fdp-dcs-bench")

    # Warm the JVM once: codegen, the vectorized parquet reader, and the
    # window/agg exec paths (JVM startup & JIT excluded from per-query times).
    spark.range(1000).count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fdp_dynamically_controlled_streams_spark.schemas import load_table

    warm = load_table(spark, sf_dir, "region")
    warm.groupBy("r_regionkey").count().count()
    warm.select(F.row_number().over(Window.orderBy("r_regionkey"))).count()
    # Streaming runtime warmup (state store provider, Python state workers,
    # file-stream source) at the smoke SF — not counted.
    try:
        spark_queries()["controller_streaming_replay"](
            spark, "/root/testdata/sf0.001"
        ).count()
    except Exception:
        pass  # warmup only; the measured run below will surface real errors
    # Python DataSource machinery warmup (planning worker + registration):
    # ~5 s one-time, paid here so heater_sim measures generation, not setup.
    try:
        from fdp_dynamically_controlled_streams_spark.sources import heater_sim

        heater_sim.register(spark)
        spark.read.format("heater_sim").option("n_sensors", 1).option(
            "n_steps", 2
        ).load().count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    qs = spark_queries()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: materializes EVERY column of every row (count() would let
        # Catalyst prune the projections of map-only queries to a bare scan).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail goes to a file; the stdout line must stay compact
    # (the driver captures a bounded tail of output — a >2 KB line gets
    # truncated mid-JSON and fails to parse, as happened in round 1).
    detail = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    except OSError:
        pass
    line = json.dumps(detail, separators=(",", ":"))
    if len(line) > 1600:
        slowest = dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
        )
        line = json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    print(line)


if __name__ == "__main__":
    main()
