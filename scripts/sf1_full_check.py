"""Full-catalog sf1 correctness run (r10 verdict task 1): every catalog
entry's Spark result vs its DuckDB oracle against the shape-preserving
10x replication (~6 M lineitem / 1 M events / 600 k docs), writing the
CORRECTNESS_SELF_r{N}_sf1.json artifact the coverage law in
tests/test_docs.py pins to the catalog.

Resumable: the artifact is flushed after EVERY entry and green records
are skipped on re-run, so an interrupted session (the r10 trial was cut
at ~60/208) continues instead of restarting.  Per-entry wall times for
both engines are printed so a pathological oracle is visible immediately.

Usage:  python scripts/sf1_full_check.py <round> [entry ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.oracle_harness import compare, duck_con, row_hash  # noqa: E402
from tests.sf1_probe import SF1, build_sf1  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: sf1_full_check.py <round> [entry ...]", file=sys.stderr)
        return 2
    rnd = int(sys.argv[1])
    only = sys.argv[2:]
    out_path = REPO / f"CORRECTNESS_SELF_r{rnd:02d}_sf1.json"

    if not Path(f"{SF1}/lineitem.parquet").exists():
        print("building sf1 replication...", flush=True)
        build_sf1()

    from fdp_dynamically_controlled_streams_spark.queries import catalog
    from fdp_dynamically_controlled_streams_spark.session import get_spark

    cat = catalog()
    names = only or list(cat)
    records: dict[str, dict] = {}
    if out_path.exists():
        records = {
            k: v for k, v in json.loads(out_path.read_text()).items()
            if k in cat
        }

    spark = get_spark(app_name="sf1-full-check")
    spark.range(1000).count()
    # streaming runtime warmup off the clock (bench.py rationale)
    try:
        cat["controller_streaming_replay"].fn(
            spark, "/root/testdata/sf0.001"
        ).count()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc!r}", file=sys.stderr)
    con = duck_con(SF1)

    def flush() -> None:
        out_path.write_text(json.dumps(records, indent=2))

    failures = 0
    for i, name in enumerate(names):
        prior = records.get(name)
        if prior and prior.get("err") in (None, "no_oracle") and not only:
            continue
        entry = cat[name]
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        t0 = time.perf_counter()
        try:
            sdf = entry.fn(spark, SF1).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"spark error: {exc}"
            print(f"[{i+1}/{len(names)}] FAIL {name}: spark error: {exc}",
                  flush=True)
            failures += 1
            flush()
            continue
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        oracle_fn = None
        if entry.oracle is not None:
            oracle_fn = lambda: con.execute(entry.oracle).fetchdf()  # noqa: E731
        elif entry.py_oracle is not None:
            oracle_fn = lambda: entry.py_oracle(con)  # noqa: E731
        if oracle_fn is None:
            rec["err"] = "no_oracle"
            print(f"[{i+1}/{len(names)}] SKIP {name}: rows-only, "
                  f"spark rows={len(sdf)} ({t_spark:.1f}s)", flush=True)
            flush()
            continue
        try:
            odf = oracle_fn()
            rec["oracle_rows"] = len(odf)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"oracle error: {exc}"
            print(f"[{i+1}/{len(names)}] FAIL {name}: oracle error: {exc}",
                  flush=True)
            failures += 1
            flush()
            continue
        t_duck = time.perf_counter() - t0
        ok, msg = compare(sdf, odf)
        rec["rows_match"] = len(sdf) == len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        rec["hash_match"] = (
            ok
            if entry.oracle is not None
            # py-reference: independent sorted-row sha per side — a real
            # hash_match since r12 (oracle_harness.row_hash rationale)
            else row_hash(sdf) == row_hash(odf)
        )
        if entry.oracle is None:
            if not ok:
                rec["err"] = f"py_oracle {msg}"
        elif not ok:
            rec["err"] = msg
        failures += 0 if ok else 1
        print(
            f"[{i+1}/{len(names)}] {'PASS' if ok else 'FAIL'} {name}: {msg} "
            f"(spark {t_spark:.1f}s, oracle {t_duck:.1f}s)",
            flush=True,
        )
        flush()
    flush()
    n_green = sum(
        1 for r in records.values() if r.get("err") in (None, "no_oracle")
    )
    print(f"wrote {out_path.name}: {n_green}/{len(records)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
