"""Aggregate device op time by source file:line from a jax profiler trace.

Usage: python scripts/trace_by_source.py <trace.json.gz> [n_frames]
Groups every XLA-op event on the device timeline by its `source` arg
(fallback: hlo name prefix), prints a sorted ms/frame table. This is the
round-4 attribution tool: fusion numbers alone don't say WHOSE code they are.
"""
import gzip, json, sys, collections

path = sys.argv[1]
nf = int(sys.argv[2]) if len(sys.argv) > 2 else 3
with gzip.open(path, "rt") as f:
    tr = json.load(f)
pid_names = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
# thread 2 is "XLA Modules" (whole-module envelope) — exclude to avoid double count
tnames = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tnames[(e["pid"], e["tid"])] = e["args"]["name"]
op_tids = {k[1] for k, v in tnames.items() if k[0] in dev and v == "XLA Ops"}

agg = collections.Counter()
cnt = collections.Counter()
total = 0
for e in tr["traceEvents"]:
    if e.get("ph") != "X" or e.get("pid") not in dev or e.get("tid") not in op_tids:
        continue
    src = e.get("args", {}).get("source", "")
    if not src:
        src = "<" + e["name"].split(".")[0] + ">"
    src = src.replace("/root/repo/", "")
    agg[src] += e.get("dur", 0)
    cnt[src] += 1
    total += e.get("dur", 0)
print(f"total XLA-op device time: {total/1e3/nf:.2f} ms/frame over {nf} frames")
for src, dur in agg.most_common(60):
    print(f"{dur/1e3/nf:9.3f} ms/frame  x{cnt[src]//nf:5d}  {src}")
