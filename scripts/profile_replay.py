"""Per-micro-batch cost attribution for the streaming replay entries.

Runs the named catalog entries (argv, default: a representative replay set)
once in a warm session with a StreamingQueryListener attached, and prints
each streaming query's per-batch durationMs breakdown (triggerExecution,
queryPlanning, getBatch, addBatch, walCommit, commitOffsets, ...) plus the
entry's wall seconds.  Measurement-only tooling (guide §1): it never touches
what the entries compute.

Usage: python scripts/profile_replay.py [entry ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from fdp_dynamically_controlled_streams_spark.queries import spark_queries  # noqa: E402
from fdp_dynamically_controlled_streams_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "stream_interval_full_join_replay",
    "stream_ewma_replay",
    "stream_mv_agg_replay",
    "stream_degree_count_replay",
    "controller_streaming_replay",
]


class Capture(StreamingQueryListener):
    def __init__(self) -> None:
        self.events: list[dict] = []
        self.starts: list[float] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.starts.append(time.perf_counter())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.events.append(
            {
                "batchId": p.get("batchId"),
                "durationMs": p.get("durationMs", {}),
                "numInputRows": p.get("numInputRows"),
                "stateOperators": [
                    {
                        "numRowsTotal": s.get("numRowsTotal"),
                        "commitTimeMs": s.get("commitTimeMs"),
                        "customMetrics": s.get("customMetrics", {}),
                    }
                    for s in p.get("stateOperators", [])
                ],
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="profile-replay")
    spark.range(1000).count()
    qs = spark_queries()
    cap = Capture()
    spark.streams.addListener(cap)
    for name in names:
        for rep in range(2):  # run twice: pass 2 hits the fixture cache
            cap.events.clear()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            batches = cap.events
            tot = lambda k: sum(e["durationMs"].get(k, 0) for e in batches)  # noqa: E731
            commit = sum(
                s["commitTimeMs"]
                for e in batches
                for s in e["stateOperators"]
                if s.get("commitTimeMs")
            )
            print(
                f"{name} pass{rep + 1}: wall={wall:.2f}s batches={len(batches)} "
                f"trigger={tot('triggerExecution')}ms addBatch={tot('addBatch')}ms "
                f"planning={tot('queryPlanning')}ms getBatch={tot('getBatch')}ms "
                f"latestOffset={tot('latestOffset')}ms walCommit={tot('walCommit')}ms "
                f"commitOffsets={tot('commitOffsets')}ms stateCommit={commit}ms"
            )
            if rep == 1:
                for e in batches:
                    print(f"   batch {e['batchId']}: {e['durationMs']}")
    spark.streams.removeListener(cap)


if __name__ == "__main__":
    main()
