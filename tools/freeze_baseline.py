"""Re-freeze BENCH_BASELINE.json: run bench.py N times (idle machine
REQUIRED — concurrent load skews every timing), take the per-query
MEDIAN of each timing block, recompute the block totals, and write the
board with a fresh provenance note.

Median, not min (VERDICT r9 task 4): a min envelope flags ordinary
single-run noise as regression; against the median a healthy idle run
flags only genuine movers.

Usage: python tools/freeze_baseline.py [--runs 4] [--note "..."]
Writes BENCH_BASELINE.json at the repo root; per-run raw outputs land
in /tmp/bench_freeze_run{i}.json.
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

BLOCKS = ("queries", "curation_queries", "analytics_queries")
TOTALS = {
    "queries": "headline_total_sec",
    "curation_queries": "curation_total_sec",
    "analytics_queries": "analytics_total_sec",
}


def main() -> None:
    runs = 4
    note = ""
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--runs" and i + 1 < len(args):
            runs = int(args[i + 1])
        if a == "--note" and i + 1 < len(args):
            note = args[i + 1]

    outs = []
    for i in range(runs):
        out_path = f"/tmp/bench_freeze_run{i}.json"
        print(f"# freeze run {i + 1}/{runs} -> {out_path}", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"),
             "--out", out_path, "--prev", "/nonexistent"],
            check=True, cwd=ROOT, stdout=subprocess.DEVNULL,
        )
        outs.append(json.load(open(out_path)))

    board = dict(outs[-1])  # probes/scalars from the final run
    board.pop("vs_prev", None)
    run_totals = "/".join(f"{o['value']:.1f}" for o in outs)
    bands: dict[str, list[float]] = {}
    for blk in BLOCKS:
        names = set()
        for o in outs:
            names |= set(o.get(blk, {}))
        med = {
            n: round(statistics.median(
                o[blk][n] for o in outs if n in o.get(blk, {})
            ), 4)
            for n in sorted(names)
        }
        board[blk] = med
        board[TOTALS[blk]] = round(sum(med.values()), 4)
        # r14 (VERDICT r13 task 1): per-query noise band [min, max]
        # across the idle freeze runs — bench.py only flags a future
        # reading as a regression when it ALSO exceeds the query's own
        # idle ceiling x1.05, so single-window dispersion stops
        # reading as code movement.
        # r15 (ADVICE r14): the ceiling is built from per-run
        # BEST-OF-2 values only (the block values themselves — for
        # headline queries each is already min of its pair), NOT the
        # raw headline_runs samples: a single noisy raw sample during
        # the freeze would otherwise permanently raise the ceiling
        # and absolve a genuine regression that lands under it. The
        # band floor still takes the true min across raw runs (a
        # floor can only be made tighter by more samples, never
        # corrupted by an outlier).
        for n in names:
            vals = [o[blk][n] for o in outs if n in o.get(blk, {})]
            lows = list(vals)
            for o in outs:
                lows += o.get("headline_runs", {}).get(n, [])
            bands[n] = [round(min(lows), 4), round(max(vals), 4)]
    board["query_bands"] = bands
    board["value"] = round(
        sum(board[t] for t in TOTALS.values()), 4
    )
    # frozen contention-canary reference, PER POSITION (start/mid/end):
    # the probe slows ~1.5x over a full bench session from JVM/GC aging
    # alone (r12 finding), so each position freezes its own idle median
    # and bench.py flags a run whose sample exceeds ITS position >1.3x
    calib_runs = [
        o["calibration"]["samples"] for o in outs if "calibration" in o
    ]
    if calib_runs:
        labels = sorted({k for s in calib_runs for k in s})
        board["calibration_sec"] = {
            lab: round(statistics.median(
                s[lab] for s in calib_runs if lab in s
            ), 4)
            for lab in labels
        }
    stamp = datetime.date.today().isoformat()
    board["provenance"] = (
        "FROZEN per-query reference board: per-query MEDIAN over "
        f"{runs} idle runs ({stamp}; run totals {run_totals}s). "
        "Median, not min: a min envelope flags ordinary single-run "
        "noise as regression — against the median a healthy idle run "
        "flags only genuine movers. Neither drivers nor builders "
        "overwrite this file; bench.py --prev defaults to it (>1.15x "
        "flagged). Refresh only deliberately, with a new provenance "
        "note." + (f" {note}" if note else "")
    )
    dst = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(dst, "w") as fh:
        json.dump(board, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_entries = sum(len(board[b]) for b in BLOCKS)
    print(f"# wrote {dst}: {n_entries} per-query medians, "
          f"combined {board['value']}s", file=sys.stderr)


if __name__ == "__main__":
    main()
