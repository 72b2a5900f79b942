#!/usr/bin/env python3
"""Join an xplane trace with the optimized-HLO metadata: time per source line.

Usage: python tools/trace_attrib.py TRACE_DIR HLO_TXT [top_n]
Aggregates sync-op device time by (source_file:line, op_name suffix) so each
millisecond maps to model code.
"""
import glob, os, re, sys
from collections import defaultdict

trace_dir, hlo_path = sys.argv[1], sys.argv[2]
top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

# op name -> (source, module_path) from HLO
src = {}
pat = re.compile(r"%([\w.-]+) = .*?metadata=\{op_name=\"([^\"]*)\""
                 r"(?:.*?source_file=\"([^\"]*)\")?(?:.*?source_line=(\d+))?")
for line in open(hlo_path):
    m = pat.search(line)
    if not m:
        continue
    name, op_name, sf, sl = m.groups()
    step = ""
    sm = re.search(r"_run_steps/([\w.-]+)/", op_name)
    if sm:
        step = sm.group(1)
    tail = "/".join(op_name.split("/")[-2:])
    loc = f"{os.path.basename(sf)}:{sl}" if sf else ""
    src[name] = (step, tail, loc)

paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
path = max(paths, key=os.path.getmtime)
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    stepagg = defaultdict(float)
    nsteps = 0
    for pline in plane.lines:
        if "XLA Ops" not in pline.name:
            continue
        for ev in pline.events:
            nm = meta.get(ev.metadata_id, "")
            if "copy-start" in nm or "slice-start" in nm or "async" in nm:
                continue
            opn = nm.split(" ")[0].lstrip("%")
            step, tail, loc = src.get(opn, ("?", nm[:40], "?"))
            key = (step, tail, loc)
            agg[key] += ev.duration_ps / 1e9
            cnt[key] += 1
            stepagg[step] += ev.duration_ps / 1e9
    print("--- by (model step, op tail, source) ---")
    for k, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t:8.2f} ms x{cnt[k]:5d}  {k[0]:<18} {k[1][:44]:<44} {k[2]}")
    print("\n--- by model step ---")
    for k, t in sorted(stepagg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.2f} ms  {k}")
    break
