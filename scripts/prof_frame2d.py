"""2D frame attribution: sim-only vs full frame at 1080p."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from bench import _make_sprite_scene
from oxylus_tpu.runtime import SceneRunner

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
runner = SceneRunner(_make_sprite_scene(), width=1920, height=1080, render_mode="2d")
render = mode == "full"
runner.step(render=render)
out = runner.step(render=render)
jax.block_until_ready(out if out is not None else runner.state.time)
t0 = time.perf_counter()
N = 30
for _ in range(N):
    out = runner.step(render=render)
jax.block_until_ready(out if out is not None else runner.state.time)
el = (time.perf_counter() - t0) / N
print(f"2D {mode}: {el*1e3:.2f} ms/frame ({1/el:.1f} fps)")
