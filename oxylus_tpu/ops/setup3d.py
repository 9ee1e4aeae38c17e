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
    near_w: float = 0.05,
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

    # per-vertex attributes carried through clipping so the raster kernel can emit
    # the G-buffer directly (the per-pixel decode gather pass costs ~0.5 s at 1080p
    # on this target — PERF_NOTES.md): world position, world normal, uv → (VM,64,3,8)
    nrm_v = gscene.normals[gvert]
    uv_v = gscene.uvs[gvert]
    wpos_v = jnp.einsum("vij,vtcj->vtci", world[:, :3, :3], pos) + world[:, None, None, :3, 3]
    wnrm_v = jnp.einsum("vij,vtcj->vtci", world[:, :3, :3], nrm_v)
    attrs = jnp.concatenate([wpos_v, wnrm_v, uv_v], axis=-1)  # (VM,64,3,8)

    # ---- homogeneous near-plane clipping (w = eps) --------------------------
    # Each triangle yields up to SUBS_PER_TRI clipped sub-triangles; raster slot
    # r = tri*2 + s, so the visbuffer id still fits 8 bits and decode recovers the
    # source triangle as r // 2 (attributes always interpolate from the ORIGINAL
    # clip verts, which is exact for any pixel the clipped geometry covers).
    # clip at w = near_w (≈ the camera near plane): clipping at a tiny epsilon would
    # project clipped vertices to ~1e6-pixel coordinates and destroy f32 edge precision
    w_eps = near_w
    w_all = clip[..., 3]  # (VM,64,3)
    inside = w_all > w_eps
    case = (
        inside[..., 0].astype(jnp.int32)
        + inside[..., 1].astype(jnp.int32) * 2
        + inside[..., 2].astype(jnp.int32) * 4
    )  # (VM,64) in 0..7
    perm_table = jnp.array(
        [
            [0, 1, 2], [0, 1, 2], [1, 2, 0], [0, 1, 2],
            [2, 0, 1], [2, 0, 1], [1, 2, 0], [0, 1, 2],
        ],
        jnp.int32,
    )
    n_in_table = jnp.array([0, 1, 1, 2, 1, 2, 2, 3], jnp.int32)
    perm = perm_table[case]          # (VM,64,3)
    n_in = n_in_table[case]          # (VM,64)
    pc = jnp.take_along_axis(clip, perm[..., None], axis=2)  # permuted clip verts
    at = jnp.take_along_axis(attrs, perm[..., None], axis=2)  # permuted attributes
    a, bb, cc = pc[..., 0, :], pc[..., 1, :], pc[..., 2, :]
    aa_, ab_, ac_ = at[..., 0, :], at[..., 1, :], at[..., 2, :]

    def clip_t(p0, p1):
        t = (w_eps - p0[..., 3]) / jnp.where(
            jnp.abs(p1[..., 3] - p0[..., 3]) > 1e-12, p1[..., 3] - p0[..., 3], 1e-12
        )
        return jnp.clip(t, 0.0, 1.0)[..., None]

    t_ab = clip_t(a, bb)
    t_ac = clip_t(a, cc)
    t_bc = clip_t(bb, cc)
    i_ab = a + (bb - a) * t_ab
    i_ac = a + (cc - a) * t_ac
    i_bc = bb + (cc - bb) * t_bc
    # attributes are linear in clip space → same lerp weights
    ai_ab = aa_ + (ab_ - aa_) * t_ab
    ai_ac = aa_ + (ac_ - aa_) * t_ac
    ai_bc = ab_ + (ac_ - ab_) * t_bc

    one = n_in[..., None, None] == 1
    two = n_in[..., None, None] == 2
    # sub0: count==1 → (A, I_AB, I_AC); count==2 → (A, B, I_BC); count==3 → (A, B, C)
    sub0 = jnp.stack([a, bb, cc], axis=-2)
    sub0 = jnp.where(one, jnp.stack([a, i_ab, i_ac], axis=-2), sub0)
    sub0 = jnp.where(two, jnp.stack([a, bb, i_bc], axis=-2), sub0)
    # sub1: only for count==2 → (A, I_BC, I_AC)
    sub1 = jnp.stack([a, i_bc, i_ac], axis=-2)
    asub0 = jnp.stack([aa_, ab_, ac_], axis=-2)
    asub0 = jnp.where(one, jnp.stack([aa_, ai_ab, ai_ac], axis=-2), asub0)
    asub0 = jnp.where(two, jnp.stack([aa_, ab_, ai_bc], axis=-2), asub0)
    asub1 = jnp.stack([aa_, ai_bc, ai_ac], axis=-2)
    sub0_live = n_in >= 1
    sub1_live = n_in == 2

    # interleave: raster slot r = tri*2 + s  → (VM, 128, 3, 4)
    subs = jnp.stack([sub0, sub1], axis=2).reshape(vm, TRIS_PER_MESHLET * 2, 3, 4)
    asubs = jnp.stack([asub0, asub1], axis=2).reshape(vm, TRIS_PER_MESHLET * 2, 3, 8)
    sub_live = jnp.stack([sub0_live, sub1_live], axis=2).reshape(vm, TRIS_PER_MESHLET * 2)
    tri_of_slot = jax.lax.broadcasted_iota(jnp.int32, (vm, TRIS_PER_MESHLET * 2), 1) // 2
    slot_in_range = jnp.repeat(tri_in_range, 2, axis=1)

    # ---- screen projection of clipped sub-triangles -------------------------
    wsub = jnp.maximum(subs[..., 3], w_eps * 0.5)
    ndc = subs[..., :3] / wsub[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width   # (VM,128,3)
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    sz = ndc[..., 2]

    # backface: signed area in screen space (winding preserved by rotation/clipping;
    # CCW front → CW on screen after the projection's Y flip, i.e. area2 < 0)
    area2 = (sx[..., 1] - sx[..., 0]) * (sy[..., 2] - sy[..., 0]) - (
        sx[..., 2] - sx[..., 0]
    ) * (sy[..., 1] - sy[..., 0])
    front = jnp.where(jnp.asarray(backface_enabled), area2 < 0.0, jnp.abs(area2) > 1e-12)
    degenerate = jnp.abs(area2) < 1e-12

    tri_valid = slot_in_range & sub_live & front & ~degenerate & vm_valid[:, None]

    # edge functions oriented so inside ≥ 0:
    def edge(jx, jy, kx, ky):
        ea = jy - ky
        eb = -(jx - kx)
        ec = -(ea * kx + eb * ky)
        return ea, eb, ec

    e0 = edge(sx[..., 1], sy[..., 1], sx[..., 2], sy[..., 2])
    e1 = edge(sx[..., 2], sy[..., 2], sx[..., 0], sy[..., 0])
    e2 = edge(sx[..., 0], sy[..., 0], sx[..., 1], sy[..., 1])
    flip = jnp.where(area2 < 0.0, -1.0, 1.0)  # make inside-positive

    # depth plane z(x, y) = Σ zi · Ei(x,y) / Σ Ei (affine in screen space)
    inv_area = jnp.where(jnp.abs(area2) > 1e-12, 1.0 / area2, 0.0)
    za = (e0[0] * sz[..., 0] + e1[0] * sz[..., 1] + e2[0] * sz[..., 2]) * -inv_area * flip
    zb = (e0[1] * sz[..., 0] + e1[1] * sz[..., 1] + e2[1] * sz[..., 2]) * -inv_area * flip
    zc = (e0[2] * sz[..., 0] + e1[2] * sz[..., 1] + e2[2] * sz[..., 2]) * -inv_area * flip

    coeffs = jnp.stack(
        [
            e0[0] * flip, e0[1] * flip, e0[2] * flip,
            e1[0] * flip, e1[1] * flip, e1[2] * flip,
            e2[0] * flip, e2[1] * flip, e2[2] * flip,
            za, zb, zc,
        ],
        axis=-1,
    )  # (VM, 128, 12)
    coeffs = jnp.where(tri_valid[..., None], coeffs, 0.0)

    # attribute planes for the G-buffer raster: every vertex quantity q is
    # interpolated perspective-correctly as plane(q/w) / plane(1/w); both are affine
    # in screen space, so they use the same Σ vᵢ·Eᵢ / area construction as depth.
    # Layout: plane 0 = 1/w, planes 1..8 = [wpos xyz, wnrm xyz, uv] / w.
    inv_wv = 1.0 / jnp.maximum(wsub, w_eps * 0.25)  # (VM, 128, 3)
    over_w = jnp.concatenate(
        [inv_wv[..., None], asubs * inv_wv[..., None]], axis=-1
    )  # (VM, 128, 3, 9)

    def plane_of(q):  # q: (VM, 128, 3) per-sub-vertex values → (VM, 128, 3) abc
        pa = (e0[0] * q[..., 0] + e1[0] * q[..., 1] + e2[0] * q[..., 2]) * -inv_area * flip
        pb = (e0[1] * q[..., 0] + e1[1] * q[..., 1] + e2[1] * q[..., 2]) * -inv_area * flip
        pc_ = (e0[2] * q[..., 0] + e1[2] * q[..., 1] + e2[2] * q[..., 2]) * -inv_area * flip
        return jnp.stack([pa, pb, pc_], axis=-1)

    attr_planes = jnp.stack(
        [plane_of(over_w[..., i]) for i in range(9)], axis=-2
    )  # (VM, 128, 9, 3)
    attr_planes = jnp.where(tri_valid[..., None, None], attr_planes, 0.0)

    vm_slot = jax.lax.broadcasted_iota(jnp.int32, tri_valid.shape, 0)
    raster_slot = jax.lax.broadcasted_iota(jnp.int32, tri_valid.shape, 1)
    packed_id = (vm_slot << 8) | raster_slot  # visbuffer.slang packing, vm-slot-relative

    # meshlet screen bounds from valid sub-triangles
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
        "attr_planes": attr_planes,
        "tri_valid": tri_valid,
        "packed_id": packed_id,
        "slots_per_tri": 2,
        "tri_of_slot": tri_of_slot,
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
    # scatter-free list build: cum[t, s] counts overlaps among slots 0..s, so list
    # entry k is the first index where cum reaches k+1 (batched binary search —
    # scatters serialize on TPU, see PERF_NOTES.md)
    cum = jnp.cumsum(overlap.astype(jnp.int32), axis=1)
    ranks = jnp.arange(1, k_per_tile + 1, dtype=jnp.int32)
    tile_list = jax.vmap(lambda rw: jnp.searchsorted(rw, ranks, side="left"))(cum)
    tile_list = jnp.where(cum[:, -1:] >= ranks[None, :], tile_list, -1)
    overflow = jnp.sum(jnp.maximum(cum[:, -1] - k_per_tile, 0))
    return tile_list, overflow
