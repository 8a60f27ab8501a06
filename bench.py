"""Benchmark harness: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized through a noop sink (every column of every
row executes; count() would let Catalyst prune map-only queries to a bare
scan).

Measurement protocol (r3 verdict tasks 1-2): the catalog runs TWICE in one
session. Pass 1 is the cold pass — it warms JVM codegen paths, populates the
per-(entry, sf_dir) replay-fixture cache (sources.registry.cached_fixture),
and records per-query fixture-build seconds so build cost is attributed, not
guessed. The reported per-query number is the MINIMUM across passes (the
standard noise-resistant estimator — timeit's documented rationale: higher
observations are interference, not the workload). BENCH_DETAIL.json carries
every pass verbatim plus the fixture phase split, so cold-vs-warm and
build-vs-run decompositions are checked-in measurements, and the r3 "did it
regress or was it session pressure?" question can always be answered from
the artifact. SPARK_GRAFT_BENCH_PASSES=1 restores the single-cold-pass mode.
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
from fdp_dynamically_controlled_streams_spark.sources.registry import (  # noqa: E402
    FIXTURE_STATS,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
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
    # file-stream source) at the smoke SF — not counted. Warmup failures are
    # logged (not raised): the measured run below surfaces real errors, but a
    # silent pass here would mask an import regression until then.
    try:
        spark_queries()["controller_streaming_replay"](
            spark, "/root/testdata/sf0.001"
        ).count()
    except Exception as exc:  # noqa: BLE001
        print(f"bench warmup (streaming) failed: {exc!r}", file=sys.stderr)
    # Python DataSource machinery warmup (planning worker + registration):
    # ~5 s one-time, paid here so heater_sim measures generation, not setup.
    try:
        from fdp_dynamically_controlled_streams_spark.sources import heater_sim

        heater_sim.register(spark)
        spark.read.format("heater_sim").option("n_sensors", 1).option(
            "n_steps", 2
        ).load().count()
    except Exception as exc:  # noqa: BLE001
        print(f"bench warmup (heater_sim) failed: {exc!r}", file=sys.stderr)

    # Previous run's per-query detail (if checked in) BEFORE we overwrite it:
    # the soft regression report below compares this run's min-of-passes to
    # the prior round's on the common set, so >20% deltas are flagged in the
    # artifact instead of needing post-hoc archaeology (r5 verdict task 3c).
    prev_detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    prev_queries: dict[str, float] = {}
    try:
        prev_queries = json.loads(prev_detail_path.read_text()).get("queries", {})
    except (OSError, ValueError):
        pass

    qs = spark_queries()
    # SPARK_GRAFT_BENCH_ENTRIES=a,b,c runs an isolated subset with the exact
    # per-entry protocol (passes, fixture phase split). Used for quiet
    # back-to-back attribution runs (r8 verdict task 1); subset runs never
    # overwrite BENCH_DETAIL.json or the regression baseline.
    only = os.environ.get("SPARK_GRAFT_BENCH_ENTRIES", "").strip()
    subset = False
    if only:
        want = [w.strip() for w in only.split(",") if w.strip()]
        missing = [w for w in want if w not in qs]
        if missing:
            raise SystemExit(f"unknown bench entries: {missing}")
        qs = {w: qs[w] for w in want}
        subset = True
    pass_timings: list[dict[str, float]] = []
    build_sec: dict[str, float] = {}
    # Host-contention telemetry (r8 verdict: three rounds of "is this delta
    # the code or the host?" archaeology): 1-min loadavg sampled before each
    # pass and after the last, plus the /proc/stat non-idle fraction across
    # the whole run. With 32 benchmark threads, loadavg >> 32 or busy
    # fraction >> this process's share means a contended host — recorded in
    # the artifact so regressions_vs_prev can be read against it directly.
    loadavg_samples: list[float] = []

    def _cpu_times() -> tuple[float, float]:
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()[1:]
            vals = [float(x) for x in parts]
            idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)
            return sum(vals), idle
        except (OSError, ValueError, IndexError):
            return 0.0, 0.0

    cpu_t0, cpu_i0 = _cpu_times()
    for p in range(passes):
        loadavg_samples.append(round(os.getloadavg()[0], 2))
        timings: dict[str, float] = {}
        for name, fn in qs.items():
            b0 = FIXTURE_STATS["build_sec"]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: materializes EVERY column of every row.
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
            if p == 0:
                built = FIXTURE_STATS["build_sec"] - b0
                if built > 0:
                    build_sec[name] = round(built, 4)
        pass_timings.append(timings)
    loadavg_samples.append(round(os.getloadavg()[0], 2))
    cpu_t1, cpu_i1 = _cpu_times()
    host_busy_frac = (
        round(1.0 - (cpu_i1 - cpu_i0) / (cpu_t1 - cpu_t0), 4)
        if cpu_t1 > cpu_t0
        else None
    )

    measured = {
        name: min(t[name] for t in pass_timings) for name in pass_timings[0]
    }
    total = round(sum(measured.values()), 4)
    # Per-entry phase split for replay entries: pass-1 wall = fixture build
    # + query; warm passes hit the session fixture cache so `measured` is
    # already build-free wherever passes >= 2. The split makes pass-1
    # attribution explicit for entries that build fixtures.
    query_phase = {
        name: round(pass_timings[0][name] - build_sec.get(name, 0.0), 4)
        for name in build_sec
    }
    # Soft regression report: common-set entries >20% slower than the
    # previous checked-in run (and >0.1 s absolute, to skip sub-noise
    # entries). Informational — printed to stderr and carried in the
    # artifact; never fails the bench.
    regressions = {
        name: {"prev": prev_queries[name], "now": measured[name],
               "ratio": round(measured[name] / prev_queries[name], 3)}
        for name in sorted(set(measured) & set(prev_queries))
        if prev_queries[name] > 1e-9
        and measured[name] > prev_queries[name] * 1.2
        and measured[name] - prev_queries[name] > 0.1
    }
    for name, r in regressions.items():
        print(
            f"bench regression: {name} {r['prev']}s -> {r['now']}s "
            f"(x{r['ratio']})",
            file=sys.stderr,
        )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail goes to a file; the stdout line must stay compact
    # (the driver captures a bounded tail of output — a >2 KB line gets
    # truncated mid-JSON and fails to parse, as happened in round 1).
    pass_totals = [round(sum(t.values()), 4) for t in pass_timings]
    detail = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": measured,
        "sf": sf_val,
        "passes": passes,
        "pass_totals": pass_totals,
        "cold_total": pass_totals[0],
        "protocol": "min_of_passes/session_cached_fixtures/v2",
        "comparability": (
            "value is the min across passes with session-cached replay "
            "fixtures (protocol v2, r4+); rounds r1-r3 reported one cold "
            "pass including fixture build. Round-over-round cold-vs-cold "
            "comparisons must use cold_total/pass_totals[0], never value."
        ),
        "pass_queries": pass_timings,
        "pass1_fixture_build_sec": build_sec,
        "pass1_query_phase_sec": query_phase,
        "regressions_vs_prev": regressions,
        "fixture_stats": dict(FIXTURE_STATS),
        "host_loadavg_per_pass": loadavg_samples,
        "host_busy_frac": host_busy_frac,
    }
    detail_name = "BENCH_DETAIL_SUBSET.json" if subset else "BENCH_DETAIL.json"
    try:
        Path(__file__).resolve().parent.joinpath(detail_name).write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    except OSError:
        pass
    compact = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": measured,
        "sf": sf_val,
        "passes": passes,
        "pass_totals": pass_totals,
        "cold_total": pass_totals[0],
        "protocol": detail["protocol"],
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1600:
        slowest = dict(
            sorted(measured.items(), key=lambda kv: kv[1], reverse=True)[:20]
        )
        line = json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "n_queries": len(measured),
                "detail": "BENCH_DETAIL.json",
                "sf": sf_val,
                "passes": passes,
                "pass_totals": pass_totals,
                "cold_total": pass_totals[0],
                "protocol": detail["protocol"],
            },
            separators=(",", ":"),
        )
    print(line)


if __name__ == "__main__":
    main()
