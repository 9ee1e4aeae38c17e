"""Host-side occupancy analysis of the sponza raster (no TPU needed).

Rebuilds the bench scene's binned tile lists on CPU and reports, per
(raster_group, tile) config: hit counts, per-hit group-bbox coverage of the
tile, and the predicted phase-A work ratio for in-kernel Y-strip subtiling
(strips of 16/8 px) — the data for the r5 raster redesign decision.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import bench

W, H = 1920, 1080
runner = bench._build_sponza_runner(W, H)

from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, compact_triangles, setup_triangles
from oxylus_tpu.render.camera import camera_from_state

state = runner.state
cam = runner.active_camera()
gscene = runner.gscene
spec = runner.renderer3d.spec
proj_scale = H * float(jnp.abs(cam.projection[1, 1])) / 2.0
vis, lod = cull_instances(gscene, state.world, cam.frustum_planes, cam.position, proj_scale)
mi_i, mi_m, mi_v, _ = expand_meshlet_instances(gscene, vis, lod, spec.max_meshlet_instances, with_overflow=True)
vm_i, vm_m, vm_v, cnt = cull_meshlets(
    gscene, state.world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position,
    capacity=spec.max_visible_meshlets, depth_sort=True)
setup = setup_triangles(gscene, state.world, vm_i, vm_m, vm_v, cam.view_projection, W, H)
mat_idx = gscene.inst_material[vm_i]
print(f"visible meshlets: {int(cnt)}  valid tris: {int(jnp.sum(setup['tri_valid']))}")

for group in (64, 32, 16):
    dense = compact_triangles(setup, setup["tri_valid"], mat_idx, vm_i, group=group,
                              width=float(W), height=float(H))
    for tile in (64,):
        tl, ov = bin_meshlets_to_tiles(dense, W, H, tile, 256)
        tl = np.asarray(tl)
        x0 = np.asarray(dense["ml_xmin"]); x1 = np.asarray(dense["ml_xmax"])
        y0 = np.asarray(dense["ml_ymin"]); y1 = np.asarray(dense["ml_ymax"])
        tx = (W + tile - 1) // tile
        hits = tl >= 0
        n_hits = hits.sum()
        t_ids = np.nonzero(hits.any(1))[0]
        # per-hit vertical overlap with the tile, in strips
        rows = []
        for t in t_ids:
            ty0 = (t // tx) * tile
            for g in tl[t][tl[t] >= 0]:
                oy0 = max(y0[g], ty0); oy1 = min(y1[g], ty0 + tile)
                ox0 = max(x0[g], (t % tx) * tile); ox1 = min(x1[g], (t % tx) * tile + tile)
                rows.append((oy1 - oy0, ox1 - ox0))
        rows = np.array(rows)
        occ = hits.sum(1)
        for strip in (16, 8):
            n_strips = np.ceil((rows[:, 0]) / strip) + ((np.ceil(rows[:, 0]) % strip) > 0) * 0
            # conservative: overlap height h starting at arbitrary offset spans ceil(h/strip)+? -> use h/strip + 1 bound and exact via offsets unknown; use ceil(h/strip)+1 clipped to tile/strip
            ns = np.minimum(np.ceil(rows[:, 0] / strip) + 1, tile // strip)
            work_ratio = (ns * strip).sum() / (len(rows) * tile)
            print(f"group={group:3d} tile={tile}: hits={n_hits:6d} tiles_hit={len(t_ids):4d} "
                  f"mean_occ={occ[occ>0].mean():5.1f} max_occ={occ.max():4d} "
                  f"mean_ovl_h={rows[:,0].mean():5.1f}px w={rows[:,1].mean():5.1f}px "
                  f"strip{strip}: work_ratio={work_ratio:.2f}")
