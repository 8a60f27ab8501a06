"""A/B the replay-floor knobs (state partition count, provider, scratch
location) on named catalog entries WITHOUT touching the catalog: wraps
queries._replay_conf with env-driven overrides, times each entry with the
bench's own protocol (noop sink, warm session, min over passes).

Measurement-only tooling (guide §1).  Env:
  SPARK_GRAFT_SF_DIR      data dir (default /root/testdata/sf0.1)
  AB_PARTS                override _replay_conf partitions (int)
  AB_PROVIDER             'rocksdb' to override the store provider
  AB_TMPDIR               override tempfile.tempdir (e.g. /dev/shm)
  AB_PASSES               timing passes (default 3)
Usage: python scripts/replay_ab.py entry [entry ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdp_dynamically_controlled_streams_spark import queries as Q  # noqa: E402
from fdp_dynamically_controlled_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("AB_PASSES", "3"))
    parts_override = os.environ.get("AB_PARTS")
    provider = os.environ.get("AB_PROVIDER")
    tmpdir = os.environ.get("AB_TMPDIR")
    if tmpdir:
        os.makedirs(tmpdir, exist_ok=True)
        tempfile.tempdir = tmpdir

    orig = Q._replay_conf

    import contextlib

    @contextlib.contextmanager
    def patched(spark, partitions):
        p = int(parts_override) if parts_override else partitions
        with orig(spark, p):
            if provider == "rocksdb":
                prev = spark.conf.get(
                    "spark.sql.streaming.stateStore.providerClass"
                )
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass",
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider",
                )
                try:
                    yield
                finally:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass", prev
                    )
            else:
                yield

    Q._replay_conf = patched

    spark = get_spark(app_name="replay-ab")
    spark.range(1000).count()
    qs = Q.spark_queries()
    names = sys.argv[1:]
    label = (
        f"parts={parts_override or 'asis'} prov={provider or 'asis'} "
        f"tmp={tmpdir or 'asis'}"
    )
    results: dict[str, list[float]] = {n: [] for n in names}
    for p in range(passes):
        for n in names:
            t0 = time.perf_counter()
            df = qs[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            results[n].append(round(time.perf_counter() - t0, 3))
    print(f"== {label}")
    tot = 0.0
    for n in names:
        m = min(results[n])
        tot += m
        print(f"  {n}: min={m:.2f} passes={results[n]}")
    print(f"  TOTAL min-sum={tot:.2f}")


if __name__ == "__main__":
    main()
