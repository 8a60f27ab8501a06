"""Produce BENCH_QUIET_r{N}.json: the per-entry quiet floor.

Runs the full bench (bench.py, its own min-of-passes protocol) RUNS times
back-to-back on an idle host and writes the element-wise minimum per entry,
with each run's loadavg/busy-fraction telemetry attached. This is the
committed round-over-round attribution baseline: the driver's BENCH_r{N}
runs on a contended host, and the r8/r9 verdicts both needed a quiet
per-entry baseline that only survived as a total (SCALE.md, round 9).

Usage:  python scripts/quiet_baseline.py <round> [runs]
        (waits for 1-min loadavg < 2 before each run; ~10 min per run)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: quiet_baseline.py <round> [runs]", file=sys.stderr)
        return 2
    rnd = sys.argv[1]
    # default 3 runs since r12 (r11 verdict task 6: several untouched
    # sub-second entries drifted +0.2-0.35 s on a 2-run floor; a third
    # run plus the per-entry min-spread below separates the noise class
    # from real drift numerically)
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # The child MUST be a full-catalog, default-passes run: a caller env
    # carrying SPARK_GRAFT_BENCH_ENTRIES would make bench.py write
    # BENCH_DETAIL_SUBSET.json and we would silently fold a stale
    # BENCH_DETAIL.json into the committed baseline (ADVICE r9).
    child_env = {
        k: v for k, v in os.environ.items()
        if k not in ("SPARK_GRAFT_BENCH_ENTRIES", "SPARK_GRAFT_BENCH_PASSES")
    }
    details = []
    for i in range(runs):
        while os.getloadavg()[0] >= 2.0:
            print(f"run {i + 1}: waiting for idle host "
                  f"(loadavg {os.getloadavg()[0]:.2f})...")
            time.sleep(30)
        print(f"run {i + 1}/{runs}...")
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            cwd=REPO, capture_output=True, text=True, env=child_env,
        )
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
        details.append(json.loads((REPO / "BENCH_DETAIL.json").read_text()))
    qmin = {
        k: round(min(d["queries"][k] for d in details), 4)
        for k in details[-1]["queries"]
    }
    # per-entry min-spread: max-min across the runs' per-entry values —
    # the measured noise band of THIS baseline. Next round's triage can
    # treat a regression within an entry's spread as the noise class
    # without the "file untouched" argument (r11 verdict task 6).
    qspread = {
        k: round(
            max(d["queries"][k] for d in details)
            - min(d["queries"][k] for d in details),
            4,
        )
        for k in details[-1]["queries"]
    }
    # auto-tag round-over-round moves against the PREVIOUS committed
    # quiet baseline (r12 verdict task 6): a move is NOISE-CLASS iff its
    # |delta| sits inside the union of both rounds' measured min-spreads
    # (plus a 50 ms absolute floor for sub-second entries); everything
    # else is tagged real so triage is mechanical, not argumentative.
    moves: dict[str, dict] = {}
    # parse the round NUMBER out of the name and compare numerically —
    # a lexicographic compare on two-digit names mis-orders at round
    # >= 100 (r100 sorts before r13) and misses one-/three-digit names
    # entirely (r13 ADVICE)
    prior_art = sorted(
        (int(p.stem[len("BENCH_QUIET_r"):]), p)
        for p in REPO.glob("BENCH_QUIET_r[0-9]*.json")
        if p.stem[len("BENCH_QUIET_r"):].isdigit()
        and int(p.stem[len("BENCH_QUIET_r"):]) < int(rnd)
    )
    if prior_art:
        prior = json.loads(prior_art[-1][1].read_text())
        pq = prior.get("queries", {})
        ps = prior.get("query_min_spread", {})
        for k, v in qmin.items():
            if k not in pq:
                moves[k] = {"tag": "new_entry", "floor": v}
                continue
            delta = round(v - pq[k], 4)
            band = round(max(qspread.get(k, 0.0), ps.get(k, 0.0), 0.05), 4)
            moves[k] = {
                "prior_floor": pq[k],
                "floor": v,
                "delta": delta,
                "band": band,
                "tag": (
                    "within_band" if abs(delta) <= band
                    else ("improved" if delta < 0 else "regressed")
                ),
            }
        for k in pq:
            if k not in qmin:
                moves[k] = {"tag": "removed_entry", "prior_floor": pq[k]}
    snap = {
        "protocol": (
            f"min_over_{runs}_quiet_runs_of(min_of_passes)/"
            "session_cached_fixtures/v2"
        ),
        "sf": details[-1]["sf"],
        "passes_per_run": details[-1]["passes"],
        "runs": runs,
        "value": round(sum(qmin.values()), 2),
        "run_totals": [d["value"] for d in details],
        "run_host_loadavg_per_pass": [
            d.get("host_loadavg_per_pass") for d in details
        ],
        "run_host_busy_frac": [d.get("host_busy_frac") for d in details],
        "queries": qmin,
        "query_min_spread": qspread,
        "moves_vs_prior": moves,
        "prior_baseline": prior_art[-1].name if prior_art else None,
        "note": (
            "builder-side QUIET per-entry baseline: element-wise min "
            "across back-to-back full-catalog bench runs on an idle host "
            "- the noise-resistant per-entry floor for round-over-round "
            "attribution (see SCALE.md round 9)."
        ),
    }
    out = REPO / f"BENCH_QUIET_r{rnd}.json"
    out.write_text(json.dumps(snap, indent=1) + "\n")
    print(f"wrote {out} ({len(qmin)} entries, floor {snap['value']} s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
