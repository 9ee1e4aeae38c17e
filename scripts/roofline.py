"""Roofline accounting (VERDICT r2/r3/r4 ask): achieved FLOPs + HBM bytes vs
chip peaks, per kernel / per fusion, from a jax.profiler trace.

Two parts:
1. `--peaks`: measure THIS chip's practical ceilings on the real device —
   a big bf16 matmul (MXU peak) and a big f32 copy (HBM bandwidth), timed
   with in-jit scan repeats + device_get sync (the only reliable micro-method
   on this tunnel — PERF_NOTES r5).
2. `--trace <trace.json.gz> <n_frames>`: parse device-op events, extract
   operand/result shapes from the HLO long_name, compute per-op bytes moved
   and (for matmul/conv/custom-call kernels where deducible) FLOPs, and print
   achieved GB/s and TFLOP/s with % of the measured peaks.

The sum of (op bytes / peak BW) is the bandwidth-bound floor for the frame —
the roofline argument PERF_NOTES cites for each below-target metric.
"""

import collections
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8,
}

_SHAPE_RE = re.compile(r"(f32|s32|u32|bf16|f16|s16|u16|s8|u8|pred|f64|s64|u64)\[([\d,]*)\]")


def shapes_bytes(long_name: str) -> int:
    """Sum of all tensor sizes mentioned in an HLO long_name (result +
    operands) — an upper bound on the op's HBM traffic, exact for non-fused
    memory-bound ops (each tensor read or written once)."""
    total = 0
    for m in _SHAPE_RE.finditer(long_name):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def measure_peaks():
    import jax
    import jax.numpy as jnp
    import numpy as np

    REP = 20

    def timeit(run, *args):
        jax.device_get(run(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(run(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2] / REP

    # MXU peak: (4096, 4096) bf16 matmul chain (serial dependency)
    n = 4096
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def step(c, _):
            return jax.lax.dot(c, a, preferred_element_type=jnp.bfloat16), None
        out, _ = jax.lax.scan(step, a, None, length=REP)
        return jnp.sum(out.astype(jnp.float32))

    t = timeit(mm, a)
    tflops = 2 * n**3 / t / 1e12
    print(f"peak bf16 matmul: {tflops:.1f} TFLOP/s  ({n}^3 chain, {t*1e3:.2f} ms/mm)")

    # HBM bandwidth: big f32 elementwise (read + write)
    m = 64 * 1024 * 1024 // 4  # 64 MB
    x = jnp.arange(m, dtype=jnp.float32)

    @jax.jit
    def cp(x):
        def step(c, _):
            return c * 1.0000001 + 1.0, None
        out, _ = jax.lax.scan(step, x, None, length=REP)
        return out[-1]

    t = timeit(cp, x)
    gbs = 2 * m * 4 / t / 1e9
    print(f"peak HBM stream: {gbs:.0f} GB/s  (64 MB fused r+w chain)")
    return tflops, gbs


def analyze_trace(path: str, n_frames: int, peak_tflops: float, peak_gbs: float,
                  top: int = 30):
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    pid_names, tnames = {}, {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    op_tids = {k[1] for k, v in tnames.items() if k[0] in dev and v == "XLA Ops"}

    rows = []
    total_us = 0
    total_bytes = 0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev or e.get("tid") not in op_tids:
            continue
        dur = e.get("dur", 0)
        ln = e.get("args", {}).get("long_name", "")
        src = e.get("args", {}).get("source", "").replace("/root/repo/", "")
        by = shapes_bytes(ln)
        rows.append((dur, e["name"], src, by))
        total_us += dur
        total_bytes += by
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for dur, name, src, by in rows:
        key = (name.split(".")[0], src)
        agg[key][0] += dur
        agg[key][1] += by
        agg[key][2] += 1
    print(f"\ntotal device: {total_us/1e3/n_frames:.2f} ms/frame; "
          f"HBM-traffic bound at {peak_gbs:.0f} GB/s = "
          f"{total_bytes/1e9/n_frames/peak_gbs*1e3:.2f} ms/frame "
          f"({total_bytes/1e6/n_frames:.0f} MB/frame)")
    print(f"{'ms/f':>8} {'MB/f':>8} {'GB/s':>7} {'%BW':>5}  op @ source")
    for (name, src), (dur, by, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        gbs = by / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"{dur/1e3/n_frames:8.3f} {by/1e6/n_frames:8.1f} {gbs:7.0f} "
              f"{gbs/peak_gbs*100:5.0f}  {name} @ {src}")


if __name__ == "__main__":
    if "--peaks" in sys.argv:
        measure_peaks()
    else:
        i = sys.argv.index("--trace")
        path, nf = sys.argv[i + 1], int(sys.argv[i + 2])
        tf = float(os.environ.get("OX_PEAK_TFLOPS", "100"))
        bw = float(os.environ.get("OX_PEAK_GBS", "800"))
        analyze_trace(path, nf, tf, bw)
