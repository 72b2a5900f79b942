#!/usr/bin/env python3
"""Split device time into sync-compute vs DMA-wait per step.

Async copy events (copy-start/slice-start and their -done halves) have
durations spanning issue->completion, so they soak up idle dispatch gaps
and overstate "copy time" in self-time rankings.  This tool instead:

  * unions SYNC events only (fusions, custom-calls, plain copies) -> true
    compute-occupied time;
  * finds each step window (between consecutive large sync gaps) and
    reports, per step: sync busy, intra-step holes (device idle or
    DMA-wait inside the step), and which async ops cover each hole.

Usage: python tools/trace_sync_gap.py TRACE_DIR [min_gap_ms]
"""
import glob
import os
import sys
from collections import defaultdict

ASYNC_PREFIXES = ("copy-start", "slice-start", "copy-done", "slice-done",
                  "all-gather-start", "all-gather-done")


def union(intervals):
    if not intervals:
        return 0.0, []
    intervals = sorted(intervals)
    merged = [list(intervals[0])]
    for s, e in intervals[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return sum(e - s for s, e in merged), merged


def main():
    trace_dir = sys.argv[1]
    min_gap_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
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
        sync, asyn = [], []
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                s = ev.offset_ps / 1e9
                e = s + ev.duration_ps / 1e9
                base = name.lstrip("%")
                if base.startswith(ASYNC_PREFIXES):
                    asyn.append((s, e, name))
                else:
                    sync.append((s, e, name))
        busy, merged = union([(s, e) for s, e, _ in sync])
        print(f"plane {plane.name}: sync events {len(sync)}, "
              f"async {len(asyn)}, sync busy {busy:.1f} ms")
        # step windows = maximal runs of sync activity separated by big gaps
        steps = []
        cur = [merged[0]]
        for iv in merged[1:]:
            if iv[0] - cur[-1][1] > min_gap_ms:
                steps.append(cur)
                cur = [iv]
            else:
                cur.append(iv)
        steps.append(cur)
        for si, ivs in enumerate(steps):
            span = ivs[-1][1] - ivs[0][0]
            sb = sum(e - s for s, e in ivs)
            holes = []
            for (s0, e0), (s1, e1) in zip(ivs, ivs[1:]):
                holes.append((e0, s1))
            hole_t = sum(e - s for s, e in holes)
            print(f"\nstep {si}: span {span:.1f} ms, sync busy {sb:.1f} ms, "
                  f"intra-step holes {hole_t:.2f} ms over {len(holes)} gaps")
            # attribute holes to covering async ops
            hole_attr = defaultdict(float)
            for hs, he in holes:
                if he - hs < 0.05:
                    continue
                cover = [(s, e, n) for s, e, n in asyn
                         if s < he and e > hs]
                key = tuple(sorted({n.split(" = ")[0] for _, _, n in cover})
                            )[:3] or ("<nothing running>",)
                hole_attr[key] += he - hs
            for key, t in sorted(hole_attr.items(), key=lambda kv: -kv[1])[:12]:
                print(f"   {t:7.2f} ms  {' | '.join(k[:60] for k in key)}")


if __name__ == "__main__":
    main()
