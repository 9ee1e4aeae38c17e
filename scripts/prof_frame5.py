"""Per-op device attribution for the BASELINE config-5 full frame (bench_frame_5)."""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

NFRAMES = int(os.environ.get("OX_PROF_FRAMES", "6"))

# build the exact bench scene/runner but trace instead of timing
import dataclasses
import time

import numpy as np

# reuse bench_frame_5's builder by monkey-stopping before its timing loop:
# simplest is to replicate the runner via its internals — instead call the
# function with frames=0 would still time; so inline a copy-free approach:
# bench_frame_5 returns fps; we need the runner. Factor: call the private
# builder if present, else rebuild here.
from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.render.renderer3d import RenderSpec
from oxylus_tpu.render.sky import AtmosphereParams
from oxylus_tpu.runtime import SceneRunner
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render3d import cube_mesh
from tests.test_native_bake import sphere_mesh

W, H = int(os.environ.get("OX_W", "1920")), int(os.environ.get("OX_H", "1080"))
n_objects, n_boxes = 150, 255

spec = SceneSpec(max_entities=1024, max_bodies=512)
s = Scene("full_frame", spec=spec)
cam = s.create_entity("camera")
cam.add("TransformComponent", position=(0.0, 8.0, 30.0))
cam.add("CameraComponent", fov=60.0)
s.set_field(cam.index, "CameraComponent", "pitch", -0.25)
sun = s.create_entity("sun")
sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
sun.add("LightComponent", type="Directional", intensity=4.0)
floor = s.create_entity("floor")
floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
floor.add("BoxColliderComponent", size=(100.0, 1.0, 100.0), friction=0.6)
side = int(np.ceil(np.sqrt(n_objects)))
for i in range(n_objects):
    e = s.create_entity(f"obj_{i}")
    e.add("TransformComponent",
          position=((i % side - side / 2) * 3.0, 0.0, (i // side - side / 2) * 3.0))
    e.add("MeshComponent", mesh_index=i % 2)
rng = np.random.default_rng(5)
bside = int(np.ceil(n_boxes ** (1 / 3)))
cnt = 0
for ix in range(bside):
    for iy in range(bside):
        for iz in range(bside):
            if cnt >= n_boxes:
                break
            e = s.create_entity(f"box_{cnt}")
            j = rng.uniform(-0.05, 0.05, 3)
            e.add("TransformComponent", position=(
                (ix - bside / 2) * 1.2 + j[0], 3.0 + iy * 1.2 + j[1],
                (iz - bside / 2) * 1.2 + j[2]))
            e.add("MeshComponent", mesh_index=0)
            e.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
            e.add("RigidBodyComponent", type="Dynamic", mass=1.0)
            cnt += 1

cp, cn, cu, ci = cube_mesh()
sp_, sn, su, si = sphere_mesh(16, 32)
meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]
runner = SceneRunner(
    s, width=W, height=H, render_mode="3d", meshes=meshes,
    render_spec=RenderSpec(width=W, height=H),
    atmosphere=AtmosphereParams(), enable_shadows=True,
    use_megakernel=True,
)
runner.config = dataclasses.replace(runner.config, ssr_enable=True)
runner.run(3)

trace_dir = "/tmp/jax_trace5"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    img = None
    for _ in range(NFRAMES):
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
print(f"total device time: {total/1e3/NFRAMES:.2f} ms/frame")
top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:70]
for name, (dur, cnt) in top:
    print(f"{dur/1e3/NFRAMES:9.2f} ms/frame  x{cnt//NFRAMES:4d}  {name[:110]}")
