#!/usr/bin/env python3
"""Timeline analysis of an xplane trace: union busy time + sync-op ranking.

``profile_forward.py``'s per-op table sums event durations, but async ops
(copy-start/slice-start) have durations spanning start->done and overlap
compute, so the sum wildly overstates them.  This tool instead:

  * computes the UNION of event intervals (true device busy time),
  * computes each op's SELF time on the serialized timeline (time where it
    is the only event running, plus an even split of overlapped spans), and
  * ranks ops by self time — the honest critical-path attribution.

Usage: python tools/trace_busy.py /tmp/ccn_trace_dir [top_n]
"""

import glob
import os
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
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
        events = []  # (start_ps, end_ps, name)
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                start = line.timestamp_ns * 1000 + ev.offset_ps
                events.append((start, start + ev.duration_ps, name))
        if not events:
            continue
        events.sort()
        # union busy time
        union = 0
        cur_s, cur_e = events[0][0], events[0][1]
        for s, e, _ in events[1:]:
            if s > cur_e:
                union += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        union += cur_e - cur_s
        span = events[-1][1] - events[0][0]
        print(f"plane {plane.name}: {len(events)} events, span "
              f"{span/1e9:.1f} ms, union busy {union/1e9:.1f} ms")

        # self-time attribution via sweep over interval boundaries: at any
        # instant, split the instant among the ops currently active.
        bounds = []
        for i, (s, e, _) in enumerate(events):
            bounds.append((s, 1, i))
            bounds.append((e, -1, i))
        bounds.sort()
        active = set()
        self_time = defaultdict(float)
        prev_t = bounds[0][0]
        for t, kind, i in bounds:
            if t > prev_t and active:
                share = (t - prev_t) / len(active)
                for j in active:
                    self_time[events[j][2]] += share
                prev_t = t
            elif t > prev_t:
                prev_t = t
            if kind == 1:
                active.add(i)
            else:
                active.discard(i)

        def base(name):
            # strip %op.NNN -> op kind plus a shape hint
            m = re.match(r"%([\w-]+?)[.\s]", name)
            kind = m.group(1) if m else name[:20]
            sm = re.search(r"(?:f32|bf16|s32|u32|pred)\[[\d,]*\]", name)
            return f"{kind} {sm.group(0) if sm else ''}"

        print(f"\n--- top {top} ops by SELF time (ms, whole trace) ---")
        for name, t in sorted(self_time.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t/1e9:9.2f}  {name[:130]}")

        cat = defaultdict(float)
        for name, t in self_time.items():
            m = re.match(r"%([\w-]+?)[.\s]", name)
            cat[m.group(1) if m else name[:24]] += t
        print("\n--- self time by category (ms) ---")
        for k, t in sorted(cat.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{t/1e9:9.2f}  {k}")
        return


if __name__ == "__main__":
    main()
