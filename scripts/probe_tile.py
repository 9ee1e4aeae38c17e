"""A/B the G-buffer raster tile size (64 vs 32 px) on the REAL sponza frame
inputs, in ONE process (PERF_NOTES measurement rule). Each config times a
10-deep sequential scan of the raster inside one jit (carry-dependent ml_near
defeats CSE), so per-call dispatch is amortized and configs compare honestly."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import _build_sponza_runner

W, H = 1920, 1080
runner = _build_sponza_runner(W, H)
gscene = runner.gscene
world = runner.state.world
spec = runner.renderer3d.spec
cam = runner.active_camera()

from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.raster3d import pack_gbuffer_coeff_matrix, rasterize_gbuffer_pallas
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles

proj_scale = H * float(jnp.abs(cam.projection[1, 1])) / 2.0
vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, proj_scale)
mi_inst, mi_ml, mi_valid, _ = expand_meshlet_instances(
    gscene, vis, lod, spec.max_meshlet_instances, with_overflow=True)
vm_inst, vm_ml, vm_valid, vm_count = cull_meshlets(
    gscene, world, mi_inst, mi_ml, mi_valid, cam.frustum_planes, cam.position,
    capacity=spec.max_visible_meshlets, depth_sort=True)
setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)

materials = runner.bindings.materials
mat_idx = gscene.inst_material[vm_inst]
mat_consts = jnp.concatenate(
    [materials.albedo_color[mat_idx][:, :3], materials.metallic_factor[mat_idx][:, None],
     materials.roughness_factor[mat_idx][:, None], materials.emissive_color[mat_idx]], axis=1)
cm_gb, attr_gb = pack_gbuffer_coeff_matrix(
    setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts)
ml_near = jnp.max(
    jnp.where(setup["tri_valid"], jnp.max(setup["sxyz"][..., 2], axis=-1), -1.0), axis=-1)
ml_near_eo = jnp.flip(jax.lax.cummax(jnp.flip(ml_near)))

REPS = 10
configs = [(64, 64), (32, 64), (32, 48), (64, 32)]
for tile, kcap in configs:
    tl, ovf = bin_meshlets_to_tiles(setup, W, H, tile, kcap)
    occ = jax.device_get(jnp.sum((tl >= 0).astype(jnp.int32)))
    ovf = int(jax.device_get(ovf))
    if ovf:
        print(f"tile={tile} k={kcap}: OVERFLOW {ovf} — skipping")
        continue

    @jax.jit
    def run(cm, at, tl, near):
        def step(carry, _):
            d, v, gb = rasterize_gbuffer_pallas(
                cm, at, tl, W, H, ml_near=near + 0.0 * carry, tile=tile)
            return jnp.max(d) * 0.0, (jnp.sum(d), jnp.max(v))
        _, (ds, vs) = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
        return ds, vs

    ds, vs = run(cm_gb, attr_gb, tl, ml_near_eo)
    jax.block_until_ready(ds)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        ds, vs = run(cm_gb, attr_gb, tl, ml_near_eo)
        jax.block_until_ready(ds)
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    med = sorted(ts)[len(ts) // 2]
    print(f"tile={tile} k={kcap}: {med:.2f} ms/raster (hits={int(occ)})  all={['%.2f' % t for t in ts]}",
          flush=True)
