"""On-device attribution of the G-buffer raster on the REAL sponza workload.

BENCH_r04 groundwork: the sponza frame trace shows rasterize_gbuffer_pallas at
~16 ms/frame while synthetic probes (random coeffs, 4 hits/tile) sit far lower —
so attribute on the actual tile lists: print occupancy, then trace the kernel
full vs phase-A-only on the same inputs (trace parsing is the only trustworthy
timing over the axon tunnel, PERF_NOTES.md).
"""

import glob
import gzip
import json
import os
import sys

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
cam = runner.active_camera()

from oxylus_tpu.ops.cull import (  # noqa: E402
    cull_instances, cull_meshlets, expand_meshlet_instances,
)
from oxylus_tpu.ops.raster3d import (  # noqa: E402
    pack_gbuffer_coeff_matrix, rasterize_gbuffer_pallas,
)
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles  # noqa: E402

proj_scale = H * float(jnp.abs(cam.projection[1, 1])) / 2.0
materials = runner.bindings.materials


@jax.jit
def build_inputs(world):
    vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, proj_scale)
    mi_i, mi_m, mi_v = expand_meshlet_instances(gscene, vis, lod, spec.max_meshlet_instances)
    vm_i, vm_m, vm_v, cnt = cull_meshlets(
        gscene, world, mi_i, mi_m, mi_v, cam.frustum_planes, cam.position,
        capacity=spec.max_visible_meshlets, depth_sort=True,
    )
    setup = setup_triangles(gscene, world, vm_i, vm_m, vm_v, cam.view_projection, W, H)
    mat_idx = gscene.inst_material[vm_i]
    from oxylus_tpu.ops.setup3d import compact_triangles

    grp = int(os.environ.get("OX_GROUP", str(spec.raster_group)))
    dense = compact_triangles(
        setup, setup["tri_valid"], mat_idx, vm_i,
        group=grp, width=float(W), height=float(H),
    )
    consts_m = jnp.concatenate(
        [
            materials.albedo_color[:, :3],
            materials.metallic_factor[:, None],
            materials.roughness_factor[:, None],
            materials.emissive_color,
        ],
        axis=1,
    )
    cm, attr = pack_gbuffer_coeff_matrix(
        dense["coeffs"], dense["attr_planes"], dense["tri_valid"],
        consts_m[dense["slot_material"]],
    )
    tl, ov = bin_meshlets_to_tiles(dense, W, H, spec.tile, spec.meshlets_per_tile)
    ml_near_eo = jnp.flip(jax.lax.cummax(jnp.flip(dense["ml_near"])))
    return cm, attr, tl, ml_near_eo, dense["count"]


cm, attr, tl, ml_near_eo, ntri = build_inputs(world)
jax.block_until_ready(cm)

tl_np = np.asarray(jax.device_get(tl))
occ = (tl_np >= 0).sum(1)
print(
    f"tiles={len(occ)} occupied={(occ > 0).sum()} hits={occ.sum()} "
    f"mean={occ.mean():.1f} p50={np.percentile(occ, 50):.0f} "
    f"p90={np.percentile(occ, 90):.0f} max={occ.max()} "
    f"k_cap={tl_np.shape[1]} tris={int(jax.device_get(ntri))}",
    flush=True,
)

variants = [("full", "ab"), ("phaseA", "a")]
fns = {}
for name, ph in variants:
    d, v, gb = rasterize_gbuffer_pallas(cm, attr, tl, W, H, ml_near=ml_near_eo, phases=ph)
    jax.block_until_ready(d)
    fns[name] = ph

trace_dir = "/tmp/jax_trace_raster"
os.system(f"rm -rf {trace_dir}")
NREP = 10
with jax.profiler.trace(trace_dir):
    for name, ph in variants:
        for _ in range(NREP):
            d, v, gb = rasterize_gbuffer_pallas(
                cm, attr, tl, W, H, ml_near=ml_near_eo, phases=ph
            )
        jax.block_until_ready((d, v, gb))

files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
agg = {}
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if "rasterize_gbuffer" not in name:
            continue
        agg.setdefault(name, []).append(ev.get("dur", 0))

for name, durs in sorted(agg.items()):
    durs = sorted(durs)
    # the two variants compile to distinct custom-calls; they appear as separate
    # trace names (suffix differs). Report each.
    print(f"{name}: n={len(durs)} median={durs[len(durs)//2]/1e3:.2f} ms "
          f"min={durs[0]/1e3:.2f} max={durs[-1]/1e3:.2f}")
