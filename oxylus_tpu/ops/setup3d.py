"""Triangle setup + meshlet→tile binning for the visbuffer rasterizer.

Stage 3 of the reference cull chain (`cull_triangles.slang:28-90`) fused with raster
setup: for every visible meshlet the 64 triangle slots are processed densely (the
workgroup-of-64 of the reference, as a vectorized axis): gather the double-indirected
vertices (`scene.slang:335-366` — indirect_vertex_indices[local_triangle_indices[...]]),
transform to clip, reject backfacing (clip-space determinant, `cull.slang:176-178`) and
near-plane-crossing triangles, and emit screen-space edge/depth plane coefficients that
the raster kernel evaluates per pixel — linear forms chosen so the inner loop is one
matmul on the MXU.

Visbuffer id packing matches the reference: 24-bit meshlet-instance id | 8-bit local
triangle (`visbuffer.slang:9-35`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math3d

Array = jax.Array

TRIS_PER_MESHLET = 64
VERTS_PER_MESHLET = 64


def setup_triangles(
    gscene,
    entity_world: Array,   # (N, 4, 4)
    vm_instance: Array,    # (VM,) visible meshlet-instance → instance index
    vm_meshlet: Array,     # (VM,) global meshlet index
    vm_valid: Array,       # (VM,)
    view_proj: Array,      # (4, 4)
    width: int,
    height: int,
    backface_enabled: bool | Array = True,
):
    """Returns a dict of per-meshlet per-triangle raster data:
    - coeffs (VM, 64, 12) f32: 3 edge planes + depth plane, each (a, b, c) over (x, y, 1)
    - tri_valid (VM, 64) bool
    - packed_id (VM, 64) i32: (vm_slot << 8) | local_tri  (visbuffer id)
    - tile AABB per meshlet: ml_xmin/xmax/ymin/ymax (VM,) f32 (screen px)
    - clip vertices (VM, 64, 3, 4) for the decode pass
    """
    vm = vm_meshlet.shape[0]
    ml = vm_meshlet
    tri_slots = jax.lax.broadcasted_iota(jnp.int32, (vm, TRIS_PER_MESHLET), 1)
    tri_in_range = tri_slots < gscene.ml_tri_count[ml][:, None]

    # double indirection gather: local tri → meshlet vertex slot → global vertex
    tri_idx = gscene.ml_tri_offset[ml][:, None] + jnp.minimum(
        tri_slots, jnp.maximum(gscene.ml_tri_count[ml][:, None] - 1, 0)
    )
    local3 = gscene.local_triangles[tri_idx]  # (VM, 64, 3) meshlet-local slots
    vslot = gscene.ml_vertex_offset[ml][:, None, None] + local3
    gvert = gscene.indirect_vertices[vslot]  # (VM, 64, 3) global vertex index
    pos = gscene.positions[gvert]  # (VM, 64, 3, 3)

    # transform: MVP = view_proj @ instance world
    world = entity_world[gscene.inst_entity[vm_instance]]  # (VM,4,4)
    mvp = jnp.einsum("ij,vjk->vik", view_proj, world)  # (VM,4,4)
    pos_h = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)  # (VM,64,3,4)
    clip = jnp.einsum("vik,vtck->vtci", mvp, pos_h)  # (VM,64,3,4)

    w = clip[..., 3]
    near_ok = jnp.all(w > 1e-6, axis=-1)  # (VM,64) — near-crossing tris dropped

    ndc = clip[..., :3] / jnp.maximum(jnp.abs(w), 1e-9)[..., None] * jnp.sign(w)[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width   # (VM,64,3)
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    sz = ndc[..., 2]

    # backface: signed area in screen space (reverse-winding after Y flip is baked in
    # via the projection; CCW front assumed like the reference's visbuffer pipeline)
    area2 = (sx[..., 1] - sx[..., 0]) * (sy[..., 2] - sy[..., 0]) - (
        sx[..., 2] - sx[..., 0]
    ) * (sy[..., 1] - sy[..., 0])
    front = jnp.where(jnp.asarray(backface_enabled), area2 < 0.0, jnp.abs(area2) > 0.0)
    degenerate = jnp.abs(area2) < 1e-12

    tri_valid = tri_in_range & near_ok & front & ~degenerate & vm_valid[:, None]

    # edge functions oriented so inside ≥ 0 for CW screen triangles (area2 < 0):
    # E_i = (y_j - y_k)(x - x_k) - (x_j - x_k)(y - y_k) normalized by sign(area)
    def edge(jx, jy, kx, ky):
        a = jy - ky
        b = -(jx - kx)
        c = -(a * kx + b * ky)
        return a, b, c

    # edges opposite each vertex: e0 uses (v1, v2), e1 (v2, v0), e2 (v0, v1)
    e0 = edge(sx[..., 1], sy[..., 1], sx[..., 2], sy[..., 2])
    e1 = edge(sx[..., 2], sy[..., 2], sx[..., 0], sy[..., 0])
    e2 = edge(sx[..., 0], sy[..., 0], sx[..., 1], sy[..., 1])
    flip = jnp.where(area2 < 0.0, -1.0, 1.0)  # make inside-positive

    # depth plane z(x, y) via barycentric-weighted NDC z (affine in screen space):
    # z = Σ zi · Ei(x,y) / Σ Ei — precompute zi/area-scaled coefficients:
    inv_area = jnp.where(jnp.abs(area2) > 1e-12, 1.0 / area2, 0.0)
    za = (e0[0] * sz[..., 0] + e1[0] * sz[..., 1] + e2[0] * sz[..., 2]) * -inv_area * flip
    zb = (e0[1] * sz[..., 0] + e1[1] * sz[..., 1] + e2[1] * sz[..., 2]) * -inv_area * flip
    zc = (e0[2] * sz[..., 0] + e1[2] * sz[..., 1] + e2[2] * sz[..., 2]) * -inv_area * flip
    # note: Σ_i E_i(x,y) = -area2 with this edge orientation; flip folds the sign so
    # the barycentric normalizer is |area2|.

    coeffs = jnp.stack(
        [
            e0[0] * flip, e0[1] * flip, e0[2] * flip,
            e1[0] * flip, e1[1] * flip, e1[2] * flip,
            e2[0] * flip, e2[1] * flip, e2[2] * flip,
            za, zb, zc,
        ],
        axis=-1,
    )  # (VM, 64, 12)
    coeffs = jnp.where(tri_valid[..., None], coeffs, 0.0)

    vm_slot = jax.lax.broadcasted_iota(jnp.int32, (vm, TRIS_PER_MESHLET), 0)
    packed_id = (vm_slot << 8) | tri_slots  # visbuffer.slang packing, vm-slot-relative

    # meshlet screen bounds from valid triangles
    big = jnp.float32(1e9)
    txmin = jnp.where(tri_valid, jnp.min(sx, -1), big)
    txmax = jnp.where(tri_valid, jnp.max(sx, -1), -big)
    tymin = jnp.where(tri_valid, jnp.min(sy, -1), big)
    tymax = jnp.where(tri_valid, jnp.max(sy, -1), -big)
    ml_xmin = jnp.min(txmin, axis=-1)
    ml_xmax = jnp.max(txmax, axis=-1)
    ml_ymin = jnp.min(tymin, axis=-1)
    ml_ymax = jnp.max(tymax, axis=-1)

    return {
        "coeffs": coeffs,
        "tri_valid": tri_valid,
        "packed_id": packed_id,
        "ml_xmin": ml_xmin,
        "ml_xmax": ml_xmax,
        "ml_ymin": ml_ymin,
        "ml_ymax": ml_ymax,
        "clip": clip,
        "gvert": gvert,
        "sxyz": jnp.stack([sx, sy, sz], axis=-1),
    }


def bin_meshlets_to_tiles(
    setup: dict,
    width: int,
    height: int,
    tile: int,
    k_per_tile: int,
) -> tuple[Array, Array]:
    """Per-tile visible-meshlet lists. Returns (tile_list (T, K) i32 vm-slot or -1,
    overflow_count () i32 — dropped meshlet-tile pairs for stats)."""
    vm = setup["ml_xmin"].shape[0]
    tx = (width + tile - 1) // tile
    ty = (height + tile - 1) // tile
    n_tiles = tx * ty
    tile_x0 = (jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1) * tile).reshape(n_tiles, 1).astype(jnp.float32)
    tile_y0 = (jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 0) * tile).reshape(n_tiles, 1).astype(jnp.float32)
    has_tris = setup["ml_xmax"] >= setup["ml_xmin"]
    overlap = (
        (setup["ml_xmax"][None, :] >= tile_x0)
        & (setup["ml_xmin"][None, :] < tile_x0 + tile)
        & (setup["ml_ymax"][None, :] >= tile_y0)
        & (setup["ml_ymin"][None, :] < tile_y0 + tile)
        & has_tris[None, :]
    )  # (T, VM)
    slot = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
    keep = overlap & (slot < k_per_tile)
    target = jnp.where(keep, slot, k_per_tile)
    src = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, vm), 1)
    tile_list = jnp.full((n_tiles, k_per_tile), -1, jnp.int32)
    tile_list = jax.vmap(
        lambda tl, tg, sr: tl.at[tg].set(sr, mode="drop", unique_indices=True)
    )(tile_list, target, src)
    overflow = jnp.sum((overlap & ~keep).astype(jnp.int32))
    return tile_list, overflow
