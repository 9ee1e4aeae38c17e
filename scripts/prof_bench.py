"""Trace the EXACT official-bench frame (frame3d / sponza / frame5) on TPU.

Usage: OX_SCENE=frame3d python scripts/prof_bench.py
Builds the runner through bench.py's own scene builders, warms, wraps N frames
in jax.profiler.trace, then prints device-op time aggregated (a) by op name and
(b) by source file:line — the round-4 attribution method (PERF_NOTES).
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SCENE = os.environ.get("OX_SCENE", "frame3d")
NF = int(os.environ.get("OX_FRAMES", "3"))

import bench  # noqa: E402  (configures the compilation cache)

t0 = time.perf_counter()
if SCENE == "frame3d":
    runner = bench._build_frame3d_runner()
elif SCENE == "sponza":
    runner = bench._build_sponza_runner()
elif SCENE == "frame5":
    runner = bench._build_frame5_runner()
else:
    raise SystemExit(f"unknown OX_SCENE={SCENE}")
print(f"build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

t0 = time.perf_counter()
runner.run(3)  # warm + compile (frame 0 retraces once for the carry)
print(f"warm/compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

# honest wall-clock check alongside the trace
t0 = time.perf_counter()
runner.run(10)
wall = (time.perf_counter() - t0) / 10
print(f"wall: {wall * 1e3:.2f} ms/frame = {1 / wall:.1f} fps", file=sys.stderr)

trace_dir = f"/tmp/jax_trace_{SCENE}"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    runner.run(NF)

files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace:", files)
agg_op = collections.Counter()
cnt_op = collections.Counter()
agg_src = collections.Counter()
cnt_src = collections.Counter()
total = 0
for fpath in files:
    with gzip.open(fpath, "rt") as fh:
        tr = json.load(fh)
    pid_names = {}
    tnames = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    op_tids = {k[1] for k, v in tnames.items() if k[0] in dev and v == "XLA Ops"}
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in dev or e.get("tid") not in op_tids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "")
        src = e.get("args", {}).get("source", "")
        if not src:
            src = "<" + name.split(".")[0] + ">"
        src = src.replace("/root/repo/", "")
        agg_op[name] += dur
        cnt_op[name] += 1
        agg_src[src] += dur
        cnt_src[src] += 1
        total += dur

print(f"\n=== total XLA-op device time: {total / 1e3 / NF:.2f} ms/frame over {NF} frames ===")
print("\n--- by source ---")
for src, dur in agg_src.most_common(50):
    print(f"{dur / 1e3 / NF:9.3f} ms/frame  x{cnt_src[src] // NF:5d}  {src}")
print("\n--- by op ---")
for name, dur in agg_op.most_common(40):
    print(f"{dur / 1e3 / NF:9.3f} ms/frame  x{cnt_op[name] // NF:4d}  {name[:110]}")
