"""On-chip scan of the sponza raster shape knobs (round 4).

Phase A of the G-buffer raster prices per (tile-hit x R slots x PIX): smaller
dense groups (compact_triangles `group`) tighten per-group screen bounds and
cut dead slots, at the cost of more binned entries per tile. Runs each config
in a subprocess (env overrides consumed by bench._build_sponza_runner) so
compilation caches don't interfere, and prints the fps table.
"""
import os
import subprocess
import sys
import time

configs = [
    # (raster_group, tile, meshlets_per_tile)
    (64, 64, 64),    # round-3 shape (control)
    (32, 64, 96),
    (16, 64, 128),
    (16, 32, 64),
    (32, 32, 48),
    (8, 32, 96),
]
if len(sys.argv) > 1:
    configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for rg, tl, mpt in configs:
    env = dict(os.environ)
    env.update(OX_BENCH="sponza", OX_RASTER_GROUP=str(rg), OX_TILE=str(tl),
               OX_MPT=str(mpt))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1500,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "(no output)"
        err = [l for l in out.stderr.splitlines() if "overflow" in l or "Error" in l][:2]
    except subprocess.TimeoutExpired:
        line, err = "(timeout)", []
    print(f"group={rg:3d} tile={tl:2d} mpt={mpt:3d}: {line} {err}", flush=True)
    # grace period between axon clients: launching a new client during the
    # previous one's teardown has wedged the remote backend for every
    # subsequent client (PERF_NOTES r4 tunnel-operations lesson)
    time.sleep(30)
