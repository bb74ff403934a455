#!/usr/bin/env python
"""Re-parse a jax.profiler perfetto trace with full op metadata (args)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/guided_trace_both"
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 25
files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace.get("traceEvents", [])
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
agg = defaultdict(float)
cnt = defaultdict(int)
meta = {}
for e in events:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    if "TPU" not in pid_names.get(e.get("pid"), ""):
        continue
    name = e.get("name", "?")
    agg[name] += e["dur"]
    cnt[name] += 1
    if name not in meta and e.get("args"):
        meta[name] = e["args"]
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:topk]:
    print(f"== {dur/1e3:9.3f} ms x{cnt[name]:<6d} {name}")
    a = meta.get(name, {})
    for k, v in a.items():
        s = str(v)
        print(f"     {k}: {s[:400]}")
