#!/usr/bin/env python
"""Aggregate a jax.profiler xplane trace into a per-op device-time report.

Usage: python tools/xplane_report.py /tmp/trace_dir [top_n]

Finds the newest ``*.xplane.pb`` under the directory, sums device-side
XLA-op durations by op name across all TensorCore lines, and prints the
top-N with a crude category tag (conv/matmul, reduce, copy/layout, pallas,
elementwise-fusion) plus per-category totals. This is the committed version
of the round-3 ``_dbg`` trace scripts — the numbers BENCH.md quotes for
"where does the step go" come from here.

Durations are summed over the whole trace window; divide by the number of
steps traced for ms/step (the tool prints both, using the step count from
the "Steps" line when present).
"""

from __future__ import annotations

import collections
import sys
from pathlib import Path


def load_xspace(trace_dir):
    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(paths[-1].read_bytes())
    return xspace, paths[-1]


CATEGORIES = (
    ("pallas", ("pallas", "custom-call")),
    ("conv/matmul", ("convolution", "dot", "conv")),
    ("reduce", ("reduce",)),
    ("copy/layout", ("copy", "transpose", "bitcast")),
    ("scatter/gather", ("scatter", "gather", "dynamic-update", "dynamic-slice")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "elementwise/fusion"


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xspace, path = load_xspace(trace_dir)

    per_op = collections.Counter()
    n_steps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "Steps":
                n_steps = max(n_steps, len(line.events))
                continue
            # XLA op lines: sum durations by op name
            if "XLA Ops" not in line.name and "XLA Op" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9  # ps -> ms

    if not per_op:
        raise SystemExit(f"no TPU 'XLA Ops' line found in {path}")
    total = sum(per_op.values())
    div = n_steps or 1
    print(f"{path.name}: {total:.1f} ms device time over "
          f"{n_steps or '?'} steps = {total / div:.1f} ms/step\n")

    per_cat = collections.Counter()
    for name, ms in per_op.items():
        per_cat[categorize(name)] += ms
    print(f"{'category':20s} {'ms total':>9s} {'ms/step':>8s} {'%':>6s}")
    for cat, ms in per_cat.most_common():
        print(f"{cat:20s} {ms:9.1f} {ms / div:8.2f} {100 * ms / total:5.1f}%")

    print(f"\ntop {top_n} ops (ms/step):")
    for name, ms in per_op.most_common(top_n):
        print(f"  {ms / div:8.2f}  [{categorize(name):18s}] {name[:95]}")


if __name__ == "__main__":
    main()
