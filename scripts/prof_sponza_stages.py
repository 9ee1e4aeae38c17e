"""Cumulative-stage timing of the geometry pipeline on the Sponza bench scene.

Reuses bench.py's cached atrium bake + the exact bench capacities, then times
cumulative jits (cull -> +expand -> +setup -> +bin -> +pack -> +raster) the way
prof_frame3d_stages.py does — the only trustworthy attribution besides trace
parsing (PERF_NOTES measurement rule). The full-frame median minus the last
level approximates the non-geometry remainder (shadows/PBR/post/sky).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H = int(os.environ.get("OX_W", "1920")), int(os.environ.get("OX_H", "1080"))

from bench import _build_sponza_runner  # noqa: E402

runner = _build_sponza_runner(W, H)
gscene = runner.gscene
world = runner.state.world
spec = runner.renderer3d.spec

from oxylus_tpu.ops.cull import (  # noqa: E402
    cull_instances, cull_meshlets, expand_meshlet_instances,
)
from oxylus_tpu.ops.raster3d import (  # noqa: E402
    TILE, pack_gbuffer_coeff_matrix, rasterize_gbuffer_pallas,
)
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles  # noqa: E402
from oxylus_tpu.render.camera import camera_from_state  # noqa: E402

cam = runner.active_camera()
proj_scale = H / (2.0 * np.tan(np.radians(60.0) / 2))
print(f"caps: mi={spec.max_meshlet_instances} vm={spec.max_visible_meshlets}", flush=True)

materials = runner.bindings.materials
mat_consts_full = jnp.concatenate(
    [
        materials.albedo_color[:, :3],
        materials.metallic_factor[:, None],
        materials.roughness_factor[:, None],
        materials.emissive_color,
    ],
    axis=1,
)


def stage_fn(level):
    def fn(world):
        vis, lod = cull_instances(
            gscene, world, cam.frustum_planes, cam.position, proj_scale
        )
        if level == 0:
            return vis
        mi_i, mi_m, mi_v = expand_meshlet_instances(
            gscene, vis, lod, spec.max_meshlet_instances
        )
        vm_i, vm_m, vm_v, cnt = cull_meshlets(
            gscene, world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position,
            capacity=spec.max_visible_meshlets,
        )
        if level == 1:
            return cnt
        setup = setup_triangles(
            gscene, world, vm_i, vm_m, vm_v, cam.view_projection, W, H
        )
        if level == 2:
            return setup["ml_xmin"]
        tl, ov = bin_meshlets_to_tiles(setup, W, H, TILE, spec.meshlets_per_tile)
        if level == 3:
            return tl
        mat_idx = gscene.inst_material[vm_i]
        cm, attr = pack_gbuffer_coeff_matrix(
            setup["coeffs"], setup["attr_planes"], setup["tri_valid"],
            mat_consts_full[mat_idx],
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
    r = f(world)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(world)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] * 1e3
    print(f"level {lvl} ({names[lvl]}): {t:8.2f} ms  (delta {t - prev_t:+7.2f})", flush=True)
    prev_t = t

# full-frame reference
img = runner.step(); jax.block_until_ready(img)
ts = []
for _ in range(5):
    t0 = time.perf_counter(); img = runner.step(); jax.block_until_ready(img)
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"full frame: {sorted(ts)[2]:.1f} ms (geometry above + shadows/PBR/post/sky)")

# diagnostics: how much geometry actually survives each stage
vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, proj_scale)
mi_i, mi_m, mi_v, ovf = expand_meshlet_instances(
    gscene, vis, lod, spec.max_meshlet_instances, with_overflow=True
)
vm_i, vm_m, vm_v, cnt = cull_meshlets(
    gscene, world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position,
    capacity=spec.max_visible_meshlets,
)
setup = setup_triangles(gscene, world, vm_i, vm_m, vm_v, cam.view_projection, W, H)
tl, ov = bin_meshlets_to_tiles(setup, W, H, TILE, spec.meshlets_per_tile)
cnts = jax.device_get(tl[1]) if isinstance(tl, tuple) else None
print(
    f"visible instances={int(jax.device_get(jnp.sum(vis)))} "
    f"expanded={int(jax.device_get(jnp.sum(mi_v)))} (overflow={int(jax.device_get(ovf))}) "
    f"visible meshlets={int(jax.device_get(cnt))} "
    f"valid tris={int(jax.device_get(jnp.sum(setup['tri_valid'])))}"
)
tl_counts = jax.device_get(tl)[..., 0] if cnts is None else cnts
