"""GPU culling chain: instance cull + LOD select → meshlet expansion → meshlet cull.

Re-designs the reference's 3-stage indirect compute chain (`/root/reference/Oxylus/src/
Render/Shaders/cull_meshes.slang`, `cull_meshlets.slang`; drivers
`src/Render/Passes/CullGeometry.cpp:61-389`) as fixed-shape masked passes:

- stage 1 (`cull_instances`): frustum test on instance world AABBs + LOD selection by
  projected pixel error (the Timberdoodle-derived rule of `cull_meshes.slang:35-57`:
  pick the coarsest LOD whose screen-space error stays under `acceptable_lod_error`).
- expansion: per-instance meshlet ranges flattened by `prefix_expand` (gather-only).
- stage 2 (`cull_meshlets`): world AABB frustum test + normal-cone backface rejection
  (`cull.slang:180-186`) + optional HiZ occlusion (`test_occlusion`, added with the
  two-pass protocol), then compaction to the visible-meshlet list.

Triangle-level culling (stage 3) lives in the raster setup (`ops/setup3d.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets.bake import MAX_LODS
from ..utils import math3d
from .compact import masked_compact, prefix_expand

Array = jax.Array


def cull_instances(
    gscene,
    entity_world: Array,     # (N, 4, 4) entity world matrices
    frustum_planes: Array,   # (6, 4)
    camera_pos: Array,       # (3,)
    proj_scale_px: Array,    # () — viewport_height / (2 tan(fov/2)) in pixels
    acceptable_lod_error: Array = 2.0,  # px — reference default, SceneGPU.hpp:218
    frustum_enabled: bool | Array = True,
) -> tuple[Array, Array]:
    """Returns (visible (I,) bool, lod (I,) i32)."""
    mesh = gscene.inst_mesh
    world = entity_world[gscene.inst_entity]  # (I,4,4)
    bmin, bmax = math3d.aabb_transform(world, gscene.mesh_aabb_min[mesh], gscene.mesh_aabb_max[mesh])
    in_frustum = math3d.aabb_vs_frustum(frustum_planes[None], bmin, bmax)
    visible = gscene.inst_valid & jnp.where(jnp.asarray(frustum_enabled), in_frustum, True)

    # LOD select: projected error in pixels ≈ lod_error * scale * proj_scale / dist
    center = (bmin + bmax) * 0.5
    dist = jnp.linalg.norm(center - camera_pos[None, :], axis=-1)
    scale = jnp.max(jnp.linalg.norm(world[:, :3, :3], axis=1), axis=-1)  # max column norm
    errs = gscene.mesh_lod_error[mesh]  # (I, MAX_LODS)
    err_px = errs * scale[:, None] * proj_scale_px / jnp.maximum(dist, 1e-3)[:, None]
    acceptable = err_px < acceptable_lod_error  # (I, L); LOD0 has error 0 → always ok
    lod_ids = jax.lax.broadcasted_iota(jnp.int32, acceptable.shape, 1)
    in_chain = lod_ids < gscene.mesh_lod_count[mesh][:, None]
    pick = jnp.where(acceptable & in_chain, lod_ids, -1)
    lod = jnp.maximum(jnp.max(pick, axis=-1), 0)
    return visible, lod


def expand_meshlet_instances(
    gscene, visible: Array, lod: Array, capacity: int, with_overflow: bool = False
):
    """Visible instances × selected-LOD meshlet ranges → flat meshlet-instance records
    (`GPU::MeshletInstance`, `SceneGPU.hpp:105-108`). Returns (instance, meshlet, valid)
    — plus the count of meshlet instances dropped by the capacity budget when
    `with_overflow` (surfaced like tile-binning overflow, instead of truncating
    silently)."""
    mesh = gscene.inst_mesh
    take = jnp.take_along_axis
    lod_i = lod[:, None]
    counts = jnp.where(visible, take(gscene.mesh_lod_meshlet_count[mesh], lod_i, axis=1)[:, 0], 0)
    offsets = take(gscene.mesh_lod_meshlet_offset[mesh], lod_i, axis=1)[:, 0]
    inst, rank, valid = prefix_expand(counts, capacity)
    meshlet = offsets[inst] + rank
    meshlet = jnp.where(valid, meshlet, 0)
    if with_overflow:
        overflow = jnp.maximum(jnp.sum(counts) - capacity, 0).astype(jnp.int32)
        return inst, meshlet, valid, overflow
    return inst, meshlet, valid


def cull_meshlets(
    gscene,
    entity_world: Array,
    mi_instance: Array,  # (C,) instance index per meshlet-instance
    mi_meshlet: Array,   # (C,) global meshlet index
    mi_valid: Array,
    frustum_planes: Array,
    camera_pos: Array,
    capacity: int,
    cone_enabled: bool | Array = True,
    frustum_enabled: bool | Array = True,
    occlusion_mask: Array | None = None,  # (C,) extra visibility (HiZ result)
    depth_sort: bool = False,  # order survivors nearest-first (raster early-out)
) -> tuple[Array, Array, Array, Array]:
    """Returns compacted (vm_instance, vm_meshlet, vm_valid, count).

    With `depth_sort`, survivors are ordered by ascending camera distance so
    downstream tile lists are front-to-back — the Pallas raster's coverage
    early-out (occlusion culling at tile granularity, the TPU analog of the
    reference's per-pixel early-Z) then terminates each tile at first full
    coverage."""
    world = entity_world[gscene.inst_mesh.shape[0] * 0 + gscene.inst_entity[mi_instance]]
    ml = mi_meshlet
    center_l = gscene.ml_center[ml]
    extent_l = gscene.ml_extent[ml]
    bmin, bmax = math3d.aabb_transform(world, center_l - extent_l, center_l + extent_l)
    in_frustum = math3d.aabb_vs_frustum(frustum_planes[None], bmin, bmax)
    in_frustum = jnp.where(jnp.asarray(frustum_enabled), in_frustum, True)

    # normal-cone backface rejection (meshopt convention):
    # cull when dot(center - cam, axis) ≥ cutoff·|center - cam| + radius
    center_w = (bmin + bmax) * 0.5
    radius = jnp.linalg.norm((bmax - bmin) * 0.5, axis=-1)
    axis_w = math3d.mat4_transform_dir(world, gscene.ml_cone_axis[ml])
    axis_w = axis_w / jnp.maximum(jnp.linalg.norm(axis_w, axis=-1, keepdims=True), 1e-9)
    dvec = center_w - camera_pos[None, :]
    dlen = jnp.linalg.norm(dvec, axis=-1)
    cutoff = gscene.ml_cone_cutoff[ml]
    cone_cull = (jnp.sum(dvec * axis_w, axis=-1) >= cutoff * dlen + radius) & (cutoff < 0.99)
    cone_ok = jnp.where(jnp.asarray(cone_enabled), ~cone_cull, True)

    mask = mi_valid & in_frustum & cone_ok
    if occlusion_mask is not None:
        mask = mask & occlusion_mask

    idx, valid, count = masked_compact(mask, capacity)
    if depth_sort:
        # conservative NEAREST distance (center minus bounding radius), not
        # center distance: floors/walls at glancing angles have near vertices
        # far nearer than their centers, and the raster early-out needs near
        # depth as monotone as possible along the list (exactness is then
        # guaranteed by the suffix-max of ml_near in renderer3d).
        key = jnp.where(valid, (dlen - radius)[idx], jnp.inf)
        order = jnp.argsort(key)
        idx, valid = idx[order], valid[order]
    return mi_instance[idx], mi_meshlet[idx], valid, count
