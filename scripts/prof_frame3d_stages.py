"""Time the 3D geometry pipeline stages in isolation on TPU.

Cumulative jits: cull → +setup → +bin → +pack → +raster → +gbuffer-unpack.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

W, H = int(os.environ.get("OX_W", "960")), int(os.environ.get("OX_H", "544"))
N_OBJ = int(os.environ.get("OX_OBJ", "100"))

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from oxylus_tpu.ops.raster3d import (
    pack_gbuffer_coeff_matrix, rasterize_gbuffer_pallas,
)
from oxylus_tpu.render.camera import camera_matrices
from oxylus_tpu.render.scene3d import upload_meshes
from tests.test_render3d import cube_mesh
from tests.test_native_bake import sphere_mesh

cp, cn, cu, ci = cube_mesh()
sp_, sn, su, si = sphere_mesh(16, 32)
meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]
side = int(np.ceil(np.sqrt(N_OBJ)))
instances = []
world = np.tile(np.eye(4, dtype=np.float32), (N_OBJ, 1, 1))
for i in range(N_OBJ):
    world[i, 0, 3] = (i % side - side / 2) * 3.0
    world[i, 2, 3] = (i // side - side / 2) * 3.0
    instances.append((i % 2, i, 0))
gscene = upload_meshes(meshes, instances)
world = jnp.asarray(world)
cam = camera_matrices(
    position=jnp.array([0.0, 8.0, 30.0]), yaw=jnp.float32(-np.pi / 2),
    pitch=jnp.float32(-0.25), tilt=jnp.float32(0.0), fov_deg=jnp.float32(60.0),
    near=jnp.float32(0.05), far=jnp.float32(1000.0), zoom=jnp.float32(1.0),
    projection_kind=jnp.int32(0), aspect=jnp.float32(W / H),
)
proj_scale = H / (2.0 * np.tan(np.radians(60.0) / 2))
mat_consts = jnp.ones((4096, 8), jnp.float32)


def stage_fn(level):
    def fn(world):
        vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, proj_scale)
        if level == 0:
            return vis
        mi_i, mi_m, mi_v = expand_meshlet_instances(gscene, vis, lod, 1 << 16)
        vm_i, vm_m, vm_v, cnt = cull_meshlets(
            gscene, world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position, capacity=4096
        )
        if level == 1:
            return cnt
        setup = setup_triangles(gscene, world, vm_i, vm_m, vm_v, cam.view_projection, W, H)
        if level == 2:
            return setup["ml_xmin"]
        tl, ov = bin_meshlets_to_tiles(setup, W, H, 32, 64)
        if level == 3:
            return tl
        cm, attr = pack_gbuffer_coeff_matrix(
            setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts[: vm_i.shape[0]]
        )
        if level == 4:
            return cm
        d, v, gb = rasterize_gbuffer_pallas(cm, attr, tl, W, H)
        return d

    return fn


names = ["cull_inst+meshlet", "+expand/compact", "+setup", "+bin", "+pack", "+raster"]
prev_t = 0.0
for lvl in range(6):
    f = jax.jit(stage_fn(lvl))
    r = f(world); jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); r = f(world); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] * 1e3
    print(f"level {lvl} ({names[lvl]}): {t:8.2f} ms  (delta {t - prev_t:+7.2f})")
    prev_t = t
