"""Per-entry volume-scaling attribution (r9 verdict task 2): fit
wall(copies) = C + g * copies on THREE shape-preserving volume points
(sf0.1 = 1 copy, a 4-copy mid build, sf1 = 10 copies) for the entries
whose sf1/sf0.1 probe factor looks fat, and write SCALE_FIT.json.

Why 3 points: the 2-point SF1_PROBE factor cannot distinguish "linear
data-growth riding on a fixed per-run constant" (fine at 100 TB — the
constant amortizes away) from genuinely super-linear growth (not fine).
With a mid point, a linear model either fits (|residual| small at the
held-out shape) or it doesn't; the residual IS the attribution.

Usage:  python scripts/scale_fit.py [entry ...]   (defaults below; waits
        for an idle host, min-of-2 passes per point, one session)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
MID = str(REPO / ".sfscale" / "sf04")
SF1 = str(REPO / ".sfscale" / "sf1")
MID_COPIES = 4

#: the fattest sf1 probe factors (SF1_PROBE.json, round 9)
DEFAULT_ENTRIES = [
    "dedup_ngram_span_removal",
    "dedup_semantic_clusters",
    "contamination_ngram_overlap",
]


def main() -> int:
    from tests.sf1_probe import build_replication

    from fdp_dynamically_controlled_streams_spark.queries import catalog
    from fdp_dynamically_controlled_streams_spark.session import get_spark

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    if not Path(f"{MID}/lineitem.parquet").exists():
        print(f"building {MID_COPIES}-copy mid replication...")
        build_replication(MID, MID_COPIES)
    if not Path(f"{SF1}/lineitem.parquet").exists():
        print("building sf1 replication...")
        build_replication(SF1, 10)

    while os.getloadavg()[0] >= 2.0:
        print(f"waiting for idle host (loadavg {os.getloadavg()[0]:.2f})...")
        time.sleep(30)

    run_loadavg = [round(v, 2) for v in os.getloadavg()]
    spark = get_spark(app_name="scale-fit")
    spark.range(1000).count()
    cat = catalog()
    points = [(1, SF01), (MID_COPIES, MID), (10, SF1)]
    out: dict[str, dict] = {}
    for name in entries:
        walls: dict[int, float] = {}
        for copies, sfd in points:
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                cat[name].fn(spark, sfd).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            walls[copies] = round(min(times), 3)
        # least-squares fit wall = C + g*copies over the 3 points
        xs = [float(c) for c in walls]
        ys = [walls[c] for c in walls]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        g = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        C = my - g * mx
        resid = {
            str(c): round(walls[c] - (C + g * c), 3) for c in walls
        }
        worst = max(abs(v) for v in resid.values())
        rel = worst / max(ys)
        out[name] = {
            # per-entry run metadata (r11 ADVICE: a merged artifact must
            # not describe entries fitted under different copy points or
            # load with the LAST run's globals)
            "points_copies": [c for c, _ in points],
            "loadavg_at_start": run_loadavg,
            "wall_by_copies": walls,
            "fixed_C_sec": round(C, 3),
            "growth_g_sec_per_copy": round(g, 3),
            "residual_sec": resid,
            "worst_residual_frac_of_max": round(rel, 4),
            "factor_2pt": round(walls[10] / walls[1], 2),
            # the 10x factor the fit PREDICTS once the fixed constant is
            # included — how far below the 2-pt factor the constant pulls
            # the trend (r10 ADVICE: the old formula cancelled g and
            # always printed 10.0)
            "factor_fit_10x": round((C + g * 10) / max(C + g, 1e-9), 2),
            "linear_fit_ok": rel <= 0.10,
        }
        print(f"  {name}: walls={walls} C={C:.2f}s g={g:.2f}s/copy "
              f"resid={resid} linear={'OK' if rel <= 0.10 else 'POOR'}")
    # merge into the existing artifact: a subset run must not clobber
    # fits measured for other entries (round-11 fix — it did); entries
    # no longer in the catalog are pruned so removed queries don't
    # linger forever (r11 ADVICE), and metadata rides per-entry above.
    art = REPO / "SCALE_FIT.json"
    if art.exists():
        payload_prior = json.loads(art.read_text())
        prior = payload_prior.get("entries", {})
        for v in prior.values():
            # backfill per-entry metadata for records written by the
            # pre-r12 script (global metadata was the only record; its
            # loadavg described the last run, so carry it onto entries
            # that have none rather than dropping it — r12 ADVICE)
            v.setdefault("points_copies", [1, MID_COPIES, 10])
            if "loadavg_at_start" in payload_prior:
                v.setdefault(
                    "loadavg_at_start", payload_prior["loadavg_at_start"]
                )
        prior.update(out)
        out = {k: v for k, v in prior.items() if k in cat}
    payload = {
        "protocol": "min_of_2_passes/one_session/noop_sink/3_volume_points",
        "entries": out,
    }
    art.write_text(json.dumps(payload, indent=1) + "\n")
    print(f"wrote SCALE_FIT.json ({len(out)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
