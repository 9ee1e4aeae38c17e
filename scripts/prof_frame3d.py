"""3D frame stage attribution: time the frame with features toggled.

Run one config per process (the axon TPU dislikes multiple SceneRunners in one
process): `python scripts/prof_frame3d.py <config>` where config is one of
full | noshadow | nosky | nopost | raster.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

cfg = sys.argv[1] if len(sys.argv) > 1 else "full"
W, H = int(os.environ.get("OX_W", "960")), int(os.environ.get("OX_H", "544"))
N_OBJ = int(os.environ.get("OX_OBJ", "100"))

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.render.renderer3d import RenderSpec
from oxylus_tpu.render.sky import AtmosphereParams
from oxylus_tpu.runtime import SceneRunner
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render3d import cube_mesh
from tests.test_native_bake import sphere_mesh

spec = SceneSpec(max_entities=1024)
s = Scene("prof", spec=spec)
cam = s.create_entity("camera")
cam.add("TransformComponent", position=(0.0, 8.0, 30.0))
cam.add("CameraComponent", fov=60.0)
s.set_field(cam.index, "CameraComponent", "pitch", -0.25)
sun = s.create_entity("sun")
sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
sun.add("LightComponent", type="Directional", intensity=4.0)
side = int(np.ceil(np.sqrt(N_OBJ)))
for i in range(N_OBJ):
    e = s.create_entity(f"obj_{i}")
    e.add("TransformComponent", position=((i % side - side / 2) * 3.0, 0.0, (i // side - side / 2) * 3.0))
    e.add("MeshComponent", mesh_index=i % 2)

cp, cn, cu, ci = cube_mesh()
sp_, sn, su, si = sphere_mesh(16, 32)
meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]

kw = dict(render_mode="3d", meshes=meshes,
          render_spec=RenderSpec(width=W, height=H))
if cfg in ("full", "noshadow", "nopost"):
    kw["atmosphere"] = AtmosphereParams()
if cfg in ("full", "nosky", "nopost"):
    kw["enable_shadows"] = cfg != "nosky" and cfg != "raster"
if cfg == "nosky":
    kw["enable_shadows"] = True
if cfg == "nopost":
    pass

runner = SceneRunner(s, width=W, height=H, **kw)

import dataclasses


def _cfg(**kv):
    try:
        runner.config = dataclasses.replace(runner.config, **kv)
    except Exception:
        for k, v in kv.items():
            setattr(runner.config, k, v)


if cfg == "nopost":
    _cfg(bloom_enable=False, fxaa_enable=False, vbgtao_enable=False)
elif cfg == "raster":
    _cfg(bloom_enable=False, fxaa_enable=False, vbgtao_enable=False, contact_shadows=False)
elif cfg == "nogtao":
    _cfg(vbgtao_enable=False)
elif cfg == "nofxaa":
    _cfg(fxaa_enable=False)
elif cfg == "nobloom":
    _cfg(bloom_enable=False)
elif cfg == "nocontact":
    _cfg(contact_shadows=False)
elif cfg == "noocclusion":
    _cfg(culling_occlusion=False)

img = runner.step(); jax.block_until_ready(img)
img = runner.step(); jax.block_until_ready(img)  # retrace with carry
ts = []
for _ in range(6):
    t0 = time.perf_counter(); img = runner.step(); jax.block_until_ready(img)
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"CONFIG {cfg} {W}x{H} obj={N_OBJ}: median {sorted(ts)[len(ts)//2]:.1f} ms  all={['%.1f' % t for t in ts]}")

# throughput mode (pipelined, like bench.py): OX_THROUGHPUT=1
if os.environ.get("OX_THROUGHPUT") == "1":
    runner.run(2)
    t0 = time.perf_counter()
    runner.run(40)
    el = time.perf_counter() - t0
    print(f"THROUGHPUT {cfg} {W}x{H} obj={N_OBJ}: {40/el:.2f} fps ({el/40*1e3:.1f} ms/frame)")
