"""Split the G-buffer raster cost on the real bench-scene inputs (1080p):
depth-only kernel vs 22-plane G-buffer kernel, + tile occupancy stats.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

W, H = int(os.environ.get("OX_W", "1920")), int(os.environ.get("OX_H", "1080"))
N_OBJ = int(os.environ.get("OX_OBJ", "200"))

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from oxylus_tpu.ops.raster3d import (
    TILE, pack_coeff_matrix, pack_gbuffer_coeff_matrix,
    rasterize_gbuffer_pallas, rasterize_pallas,
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


@jax.jit
def build_inputs(world):
    vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, proj_scale)
    mi_i, mi_m, mi_v = expand_meshlet_instances(gscene, vis, lod, 1 << 13)
    vm_i, vm_m, vm_v, cnt = cull_meshlets(
        gscene, world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position, capacity=4096
    )
    setup = setup_triangles(gscene, world, vm_i, vm_m, vm_v, cam.view_projection, W, H)
    tl, ov = bin_meshlets_to_tiles(setup, W, H, TILE, 64)
    mat_consts = jnp.ones((vm_i.shape[0], 8), jnp.float32)
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    cm_gb, attr_gb = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts
    )
    n_live_tris = jnp.sum(setup["tri_valid"].astype(jnp.int32))
    return cm, cm_gb, attr_gb, tl, cnt, n_live_tris


cm, cm_gb, attr_gb, tl, vm_count, n_tris = build_inputs(world)
jax.block_until_ready(tl)
tl_h = np.asarray(jax.device_get(tl))
occ = (tl_h >= 0).sum(axis=1)
print(f"visible meshlets: {int(jax.device_get(vm_count))}, live tris: {int(jax.device_get(n_tris))}")
print(f"tiles: {tl_h.shape[0]}  k_cap: {tl_h.shape[1]}  TILE={TILE}")
print(f"non-empty tiles: {(occ > 0).sum()}  total hits: {occ.sum()}  "
      f"mean occ (non-empty): {occ[occ > 0].mean():.2f}  max occ: {occ.max()}")
print(f"cm: {cm.shape}  cm_gb: {cm_gb.shape}  "
      f"cm_gb bytes: {cm_gb.size * 4 / 1e6:.1f} MB")


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[3] * 1e3
    print(f"{name}: {t:8.2f} ms")
    return t


timeit("depth-only rasterize_pallas   ", rasterize_pallas, cm, tl, W, H)
timeit("gbuffer rasterize_gbuffer     ", rasterize_gbuffer_pallas, cm_gb, attr_gb, tl, W, H)
# empty tile list -> pure per-tile floor
tl_empty = jnp.full_like(tl, -1)
timeit("gbuffer, all tiles empty      ", rasterize_gbuffer_pallas, cm_gb, attr_gb, tl_empty, W, H)
timeit("depth-only, all tiles empty   ", rasterize_pallas, cm, tl_empty, W, H)
