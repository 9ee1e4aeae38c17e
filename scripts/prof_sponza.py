"""Per-op device attribution for the Sponza-class bench (BASELINE config 4).

Reuses bench.py's `_build_sponza_runner` so the traced frame is exactly the
measured frame. Parse rule from PERF_NOTES.md: only jax.profiler device-side
op durations are trustworthy over the axon tunnel.
"""

import glob
import gzip
import json
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H = int(os.environ.get("OX_W", "1920")), int(os.environ.get("OX_H", "1080"))

from bench import _build_sponza_runner  # noqa

runner = _build_sponza_runner(W, H)
img = runner.step(); jax.block_until_ready(img)
img = runner.step(); jax.block_until_ready(img)

ts = []
for _ in range(4):
    t0 = time.perf_counter(); img = runner.step(); jax.block_until_ready(img)
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"sponza {W}x{H}: median {sorted(ts)[len(ts)//2]:.1f} ms  all={['%.1f' % t for t in ts]}")

trace_dir = "/tmp/jax_trace_sponza"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        img = runner.step()
    jax.block_until_ready(img)

files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = {}
total = 0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        agg.setdefault(name, [0, 0])
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
print(f"total device time: {total/1e3/3:.2f} ms/frame")

top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:60]
for name, (dur, cnt) in top:
    print(f"{dur/1e3/3:9.2f} ms/frame  x{cnt//3:4d}  {name[:110]}")
