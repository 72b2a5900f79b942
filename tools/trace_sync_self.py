#!/usr/bin/env python3
"""Sync-only per-op self-time ranking from an xplane trace.

Async copy events (copy-start/slice-start and their -done halves) span
issue->completion and soak up time that trace_sync_gap.py proves is sync
compute, so they must be filtered OUT before ranking (see CLAUDE.md
"Honest sync-only attribution").  The sum of plain-event durations then
matches the step span.

Usage: python tools/trace_sync_self.py TRACE_DIR [top_n]
"""
import glob
import os
import re
import sys
from collections import defaultdict

ASYNC_PREFIXES = ("copy-start", "slice-start", "copy-done", "slice-done",
                  "all-gather-start", "all-gather-done", "all-reduce-start",
                  "all-reduce-done")


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        op_time = defaultdict(float)
        op_count = defaultdict(int)
        n_steps = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                base = name.lstrip("%").split(" ")[0]
                if base.rsplit(".", 1)[0].endswith(ASYNC_PREFIXES) or \
                        any(base.startswith(p) for p in ASYNC_PREFIXES):
                    continue
                op_time[name] += ev.duration_ps / 1e9  # ms
                op_count[name] += 1
        total = sum(op_time.values())
        # estimate steps from the most common custom-call repeat count
        counts = [c for n, c in op_count.items() if "custom-call" in n]
        n_steps = max(1, min(counts) if counts else 1)
        print(f"\n=== {plane.name}: sync total {total:.1f} ms, "
              f"~{n_steps} steps -> {total / n_steps:.1f} ms/step ===")
        print(f"{'ms/step':>9}  {'count':>6}  op")
        for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{t / n_steps:9.3f}  x{op_count[name] // n_steps:5d}  "
                  f"{name[:150]}")
        # category rollup on sync ops only
        cat_time = defaultdict(float)
        cat_count = defaultdict(int)
        for name, t in op_time.items():
            base = name.lstrip("%").split(" ")[0]
            cat = re.sub(r"[.\d]+$", "", base)
            cat_time[cat] += t
            cat_count[cat] += op_count[name]
        print("\n--- sync categories (ms/step) ---")
        for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{t / n_steps:9.3f}  x{cat_count[cat] // n_steps:5d}  {cat}")


if __name__ == "__main__":
    main()
