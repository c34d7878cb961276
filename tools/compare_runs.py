#!/usr/bin/env python
"""Compare two acceptance runs' results.csv (the preset A/B harness).

Usage: python tools/compare_runs.py runs/accept/clamp6 runs/accept/clamp0

Prints, per loss column: the max and final absolute difference between the
two trajectories (aligned by epoch), plus both runs' final mAP50 — the
evidence format BENCH.md cites when a semantics-affecting preset
(align_offset_clamp, bn_stats_images, ...) is promoted to a shipped config.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path


def load(run_dir):
    rows = list(csv.DictReader(open(Path(run_dir) / "results.csv")))
    if not rows:
        raise SystemExit(f"{run_dir}: empty results.csv")
    return rows


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    a, b = load(a_dir), load(b_dir)
    n = min(len(a), len(b))
    if len(a) != len(b):
        print(f"note: epoch counts differ ({len(a)} vs {len(b)}); "
              f"comparing the first {n}")

    cols = [c for c in a[0]
            if c.startswith(("train/", "val/")) and c.endswith("_loss")]
    print(f"{'column':24s} {'max |d|':>10s} {'final |d|':>10s} "
          f"{'final A':>10s} {'final B':>10s}")
    for c in cols:
        da = [float(r[c]) for r in a[:n]]
        db = [float(r[c]) for r in b[:n]]
        diffs = [abs(x - y) for x, y in zip(da, db)]
        print(f"{c:24s} {max(diffs):10.4f} {diffs[-1]:10.4f} "
              f"{da[-1]:10.4f} {db[-1]:10.4f}")

    for key in ("map50", "metrics/mAP_0.5"):
        # guard both headers (B's results.csv may lack the column), and read
        # each run's OWN last epoch — with unequal epoch counts, row n-1 is
        # not the final epoch of the longer run
        if key in a[0] and key in b[0]:
            ma = float(a[-1][key])
            mb = float(b[-1][key])
            tag = (f" (epochs {len(a)} vs {len(b)})"
                   if len(a) != len(b) else "")
            print(f"\nfinal mAP50{tag}: A({a_dir}) = {ma:.4f}   "
                  f"B({b_dir}) = {mb:.4f}   |d| = {abs(ma - mb):.4f}")
            break


if __name__ == "__main__":
    main()
