#!/usr/bin/env python
"""Summarize a jax.profiler.trace xplane dump: top ops by total device time.

Usage: python scripts/xplane_top.py <trace_dir> [top_n]

Finds the newest *.xplane.pb under <trace_dir>, sums per-op durations on the
device plane(s), and prints a table plus a per-category rollup. Durations on
the TPU device plane are real serial compute (CLAUDE.md profiling recipe).
"""
from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if not ("TPU" in plane.name or "Device" in plane.name
                or "/device" in plane.name.lower()):
            continue
        meta = plane.event_metadata
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            # XLA Ops / Steps lines both appear; use the op-level line only
            if line.name not in ("XLA Ops", "XLA TraceMe", "Ops"):
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if not totals:
            # fall back: any line with events
            for line in plane.lines:
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e9
                    counts[name] += 1
        if not totals:
            continue
        print(f"== plane: {plane.name}  ops={len(totals)} "
              f"total={sum(totals.values()):.1f} ms")
        rank = sorted(totals.items(), key=lambda kv: -kv[1])
        for name, ms in rank[:top_n]:
            print(f"{ms:10.2f} ms  x{counts[name]:<5d} {name[:120]}")

        cats = defaultdict(float)
        for name, ms in totals.items():
            n = name.lower()
            if "custom-call" in n or "tpu_custom_call" in n:
                cats["pallas/custom_call"] += ms
            elif re.search(r"\bfusion\b|loop_|input_fusion|output_fusion", n):
                cats["fusion"] += ms
            elif "convolution" in n or "conv" in n:
                cats["conv"] += ms
            elif "dot" in n:
                cats["dot"] += ms
            elif "copy" in n or "transpose" in n or "bitcast" in n:
                cats["copy/transpose"] += ms
            elif "all-reduce" in n or "all-gather" in n or "collective" in n:
                cats["collective"] += ms
            elif "dynamic" in n:
                cats["dynamic-slice/update"] += ms
            else:
                cats["other"] += ms
        print("-- categories:")
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{ms:10.2f} ms  {c}")


if __name__ == "__main__":
    main()
