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

    # ONE row gather of the prebaked per-meshlet vertex pack replaces the
    # double-indirection chain (`scene.slang:335-366`) — gathers are the expensive
    # primitive on this target (PERF_NOTES.md)
    packed = gscene.ml_packed_verts[ml].reshape(vm, 64, 3, 8)  # pos | nrm | uv
    pos = packed[..., 0:3]
    nrm_v = packed[..., 3:6]
    uv_v = packed[..., 6:8]

    # transform: MVP = view_proj @ instance world
    world = entity_world[gscene.inst_entity[vm_instance]]  # (VM,4,4)
    mvp = jnp.einsum("ij,vjk->vik", view_proj, world)  # (VM,4,4)
    pos_h = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)  # (VM,64,3,4)
    clip = jnp.einsum("vik,vtck->vtci", mvp, pos_h)  # (VM,64,3,4)

    # per-vertex attributes interpolated by the raster kernel so it can emit the
    # G-buffer directly (the per-pixel decode gather pass costs ~0.5 s at 1080p
    # on this target — PERF_NOTES.md): world normal + uv + tangent → (VM,64,3,8).
    # World position is NOT interpolated — the lighting stage reconstructs it
    # from depth + the inverse view-projection (gbuffer_from_raster).
    wnrm_v = jnp.einsum("vij,vtcj->vtci", world[:, :3, :3], nrm_v)

    # Per-triangle world-space tangent for normal mapping, shipped through the
    # spare attribute lanes as a perspective-interpolated per-triangle constant
    # (exact: Σbᵢ·c·(1/wᵢ) / Σbᵢ·(1/wᵢ) = c). The bitangent handedness is
    # encoded in the MAGNITUDE (|T| = 1 → +1, |T| = 0.5 → −1; decode threshold
    # 0.75) because the spare lane group is exactly 3 wide. Degenerate UV
    # mappings encode T = 0 → shading falls back to the interpolated normal.
    # The reference derives this frame per pixel from screen-space position/UV
    # derivatives (visbuffer_decode.slang:128-178); the per-triangle edge/UV
    # algebra below is the same frame computed exactly, with no derivative
    # estimation — the TPU-shaped formulation (no neighbor-pixel access).
    wpos_v = (
        jnp.einsum("vij,vtcj->vtci", world[:, :3, :3], pos)
        + world[:, None, None, :3, 3]
    )  # (VM, 64, 3verts, 3)
    e1w = wpos_v[..., 1, :] - wpos_v[..., 0, :]
    e2w = wpos_v[..., 2, :] - wpos_v[..., 0, :]
    duv1 = uv_v[..., 1, :] - uv_v[..., 0, :]
    duv2 = uv_v[..., 2, :] - uv_v[..., 0, :]
    detuv = duv1[..., 0] * duv2[..., 1] - duv2[..., 0] * duv1[..., 1]
    t_raw = e1w * duv2[..., 1:2] - e2w * duv1[..., 1:2]  # ∝ detuv · T
    b_raw = e2w * duv1[..., 0:1] - e1w * duv2[..., 0:1]  # ∝ detuv · B
    sgn = jnp.where(detuv < 0.0, -1.0, 1.0)[..., None]
    t_len = jnp.linalg.norm(t_raw, axis=-1, keepdims=True)
    t_hat = sgn * t_raw / jnp.maximum(t_len, 1e-20)
    ng = jnp.cross(e1w, e2w)  # geometric normal (world), handedness referee
    hand = jnp.sum(jnp.cross(ng, t_hat) * (b_raw * sgn), axis=-1, keepdims=True)
    w_hand = jnp.where(hand < 0.0, -1.0, 1.0)
    tan_ok = (jnp.abs(detuv)[..., None] > 1e-12) & (t_len > 1e-9)
    t_enc = jnp.where(tan_ok, t_hat * (0.75 + 0.25 * w_hand), 0.0)  # (VM,64,3)
    t_enc_v = jnp.broadcast_to(t_enc[..., None, :], wnrm_v.shape)

    attrs = jnp.concatenate([wnrm_v, uv_v, t_enc_v], axis=-1)  # (VM,64,3,8)

    # ---- homogeneous (Olano–Greer) triangle setup ---------------------------
    # No near-plane clipping: edge functions are built directly from the 2D
    # homogeneous pixel coordinates (x_pix·w, y_pix·w, w). The visible region of
    # any triangle — including ones crossing w = 0 — is exactly where all three
    # edge forms are positive and the interpolated w is positive, so the clipping
    # stage (and its 2× raster-slot blowup) disappears: R = 64, not 128.
    x_c = clip[..., 0]
    y_c = clip[..., 1]
    z_c = clip[..., 2]
    w_c = clip[..., 3]  # (VM, 64, 3)
    xp = (x_c * 0.5 + 0.5 * w_c) * width
    yp = (y_c * 0.5 + 0.5 * w_c) * height
    v = jnp.stack([xp, yp, w_c], axis=-1)  # (VM, 64, 3 verts, 3)

    def cross3(a, b):
        return jnp.stack(
            [
                a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
                a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
                a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
            ],
            axis=-1,
        )

    v0, v1, v2 = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    e0 = cross3(v1, v2)  # (VM, 64, 3) coefficients over (px, py, 1)
    e1 = cross3(v2, v0)
    e2 = cross3(v0, v1)
    det = jnp.sum(e0 * v0, axis=-1)  # = det[v0 v1 v2]; det < 0 ⇔ front (CCW)

    front = det < 0.0
    keep_winding = jnp.where(jnp.asarray(backface_enabled), front, jnp.abs(det) > 1e-20)
    tri_valid = tri_in_range & keep_winding & (jnp.abs(det) > 1e-20) & vm_valid[:, None]
    # fully behind the near plane → reject (w test; exact for perspective)
    all_behind = jnp.all(w_c < near_w, axis=-1)
    tri_valid = tri_valid & ~all_behind

    # orientation + scale normalization: inside ⇔ sign(det)·e > 0; scale so edge
    # evaluations live at pixel magnitude (the raw cross products are ~(px·w)²)
    maxc = jnp.maximum(
        jnp.max(jnp.abs(e0), axis=-1),
        jnp.maximum(jnp.max(jnp.abs(e1), axis=-1), jnp.max(jnp.abs(e2), axis=-1)),
    )
    s = jnp.where(det < 0.0, -1.0, 1.0) / jnp.maximum(maxc, 1e-30)
    e0 = e0 * s[..., None]
    e1 = e1 * s[..., None]
    e2 = e2 * s[..., None]

    # linear-in-clip planes: zn = Σ zᵢ·eᵢ, wd = Σ wᵢ·eᵢ, ss = Σ eᵢ. Per pixel the
    # reverse-Z depth is zn/wd (0 far … 1 near); cover additionally requires
    # wd > 0 (in front of the eye) and 0 ≤ zn ≤ wd (inside the depth range —
    # subsuming the near/far clip). Attributes interpolate perspective-correctly
    # as (Σ aᵢ·eᵢ) / ss  [Olano & Greer 1997, 2D homogeneous rasterization].
    zn = (
        e0 * z_c[..., 0, None] + e1 * z_c[..., 1, None] + e2 * z_c[..., 2, None]
    )
    wd = (
        e0 * w_c[..., 0, None] + e1 * w_c[..., 1, None] + e2 * w_c[..., 2, None]
    )
    ss = e0 + e1 + e2

    coeffs = jnp.stack([e0, e1, e2, zn, wd], axis=-2)  # (VM, 64, 5, 3)
    coeffs = jnp.where(tri_valid[..., None, None], coeffs, 0.0)
    # kill invalid slots: e0 ≡ -1e30 never covers
    coeffs = coeffs.at[..., 0, 2].set(jnp.where(tri_valid, coeffs[..., 0, 2], -1e30))

    # attribute planes (raw attribute values × edge forms; resolve divides by ss).
    # The 3-vertex contraction is expanded as broadcast multiply-adds: as an
    # einsum XLA lowers it to batched MXU matmuls bracketed by ~1.5 ms of
    # layout copies (trace), for 5 MFLOPs of work.
    attr_planes = (
        attrs[..., 0, :, None] * e0[..., None, :]
        + attrs[..., 1, :, None] * e1[..., None, :]
        + attrs[..., 2, :, None] * e2[..., None, :]
    )  # (VM, 64, 8attr, 3coeff)
    attr_planes = jnp.concatenate([ss[..., None, :], attr_planes], axis=-2)  # (VM,64,9,3)
    attr_planes = jnp.where(tri_valid[..., None, None], attr_planes, 0.0)

    vm_slot = jax.lax.broadcasted_iota(jnp.int32, tri_valid.shape, 0)
    raster_slot = jax.lax.broadcasted_iota(jnp.int32, tri_valid.shape, 1)
    packed_id = (vm_slot << 8) | raster_slot  # visbuffer.slang packing, vm-slot-relative

    # screen bounds for binning: triangles with any vertex near/behind w = 0
    # project unboundedly → conservatively bin them to the whole screen
    safe = w_c > near_w
    all_safe = jnp.all(safe, axis=-1)
    wsafe = jnp.where(safe, w_c, 1.0)
    sx = jnp.where(safe, (x_c / wsafe * 0.5 + 0.5) * width, 0.0)
    sy = jnp.where(safe, (y_c / wsafe * 0.5 + 0.5) * height, 0.0)
    sz = jnp.where(safe, z_c / wsafe, 1.0)  # behind-near ⇒ nearest (conservative)

    big = jnp.float32(1e9)
    txmin = jnp.where(tri_valid, jnp.where(all_safe, jnp.min(sx, -1), 0.0), big)
    txmax = jnp.where(tri_valid, jnp.where(all_safe, jnp.max(sx, -1), float(width)), -big)
    tymin = jnp.where(tri_valid, jnp.where(all_safe, jnp.min(sy, -1), 0.0), big)
    tymax = jnp.where(tri_valid, jnp.where(all_safe, jnp.max(sy, -1), float(height)), -big)
    ml_xmin = jnp.min(txmin, axis=-1)
    ml_xmax = jnp.max(txmax, axis=-1)
    ml_ymin = jnp.min(tymin, axis=-1)
    ml_ymax = jnp.max(tymax, axis=-1)

    return {
        "coeffs": coeffs,
        "attr_planes": attr_planes,
        "tri_valid": tri_valid,
        "packed_id": packed_id,
        "slots_per_tri": 1,
        "tri_of_slot": raster_slot,
        "ml_xmin": ml_xmin,
        "ml_xmax": ml_xmax,
        "ml_ymin": ml_ymin,
        "ml_ymax": ml_ymax,
        # per-TRIANGLE screen bounds/nearest-z (compact_triangles re-groups on these)
        "tri_xmin": txmin,
        "tri_xmax": txmax,
        "tri_ymin": tymin,
        "tri_ymax": tymax,
        "clip": clip,
        "packed_verts": packed,
        "sxyz": jnp.stack([sx, sy, sz], axis=-1),
    }


def compact_triangles(
    setup: dict,
    tri_mask: Array,       # (VM, R) triangles to keep (validity ∧ pass visibility)
    slot_material: Array,  # (VM,) material index per source meshlet
    slot_instance: Array,  # (VM,) instance index per source meshlet
    group: int = 64,       # triangles per dense raster group (static)
    width: float = 1920.0,
    height: float = 1080.0,
    mat_rows: Array | None = None,  # (M, 32) pack_material_tables rows — when
    # given, each dense slot's full material row rides the combined gather
    # (`slot_rows`), so the textured path's per-pixel resolve is ONE gather
    # instead of the slot→material→row two-gather chain (4.6 ms at 1080p half
    # res vs 1.2 — trace r4; widening a row gather is ~free, rows price per row)
):
    """Re-group surviving triangles into DENSE raster groups.

    The reference's `cull_triangles` compacts surviving triangles into a dense
    reordered index buffer so the visbuffer draw touches no dead lanes
    (`/root/reference/Oxylus/src/Render/Shaders/cull_triangles.slang:28-90`,
    `CullGeometry.cpp:61-389`). The TPU raster needs the same property: phase A
    evaluates ALL R slots of every binned group per tile, and baked meshlets
    average ~36% triangle fill on sponza — 2.8× of the dominant
    per-(slot, pixel) VPU work was dead lanes (trace, PERF_NOTES r4).

    Grouping ORDER is (coarse depth bucket, screen morton) at MESHLET
    granularity: preserving the cull's raw front-to-back order naïvely unions
    screen-DISTANT triangles into each group, inflating per-group bounds so
    much that binning produced 2.25× MORE tile hits than the sparse meshlets;
    sorting per-triangle keys instead costs a 3.5 ms 131k-element sort
    (both measured — PERF_NOTES r4). Meshlet-level keys sort 2048 elements,
    and source meshlets are internally screen-local already. Triangle bboxes
    are clamped to the screen before unioning. Correctness never depends on
    the order: the raster early-out compares a suffix-max near table.

    All per-triangle fields ride ONE combined row gather (separate gathers
    priced ~10 ns/row each — 9 of them measured 11 ms/frame, PERF_NOTES r4).

    Returns a dict shaped like `setup` (dense coeffs/attr_planes/bounds) plus:
      - slot_material / slot_instance / packed_id per DENSE (group, slot)
      - ml_near (G,): conservative nearest member z per group
      - count: number of surviving triangles."""
    vm, r = tri_mask.shape
    n = vm * r
    n_groups = n // group

    xmin = jnp.clip(setup["tri_xmin"], 0.0, width)
    xmax = jnp.clip(setup["tri_xmax"], -1.0, width)
    ymin = jnp.clip(setup["tri_ymin"], 0.0, height)
    ymax = jnp.clip(setup["tri_ymax"], -1.0, height)
    tz = jnp.max(setup["sxyz"][..., 2], axis=-1)  # (VM, R) per-tri nearest z

    # ---- meshlet-level (depth bucket, morton) order ------------------------
    BITS = 6
    any_tri = jnp.any(tri_mask, axis=1)
    mx0 = jnp.min(jnp.where(tri_mask, xmin, 1e9), axis=1)
    mx1 = jnp.max(jnp.where(tri_mask, xmax, -1e9), axis=1)
    my0 = jnp.min(jnp.where(tri_mask, ymin, 1e9), axis=1)
    my1 = jnp.max(jnp.where(tri_mask, ymax, -1e9), axis=1)
    m_near = jnp.max(jnp.where(tri_mask, tz, -1.0), axis=1)  # (VM,)
    cx = jnp.clip((mx0 + mx1) * (0.5 / width) * (1 << BITS), 0, (1 << BITS) - 1).astype(jnp.int32)
    cy = jnp.clip((my0 + my1) * (0.5 / height) * (1 << BITS), 0, (1 << BITS) - 1).astype(jnp.int32)
    mo = jnp.zeros_like(cx)
    for b in range(BITS):
        mo = mo | (((cx >> b) & 1) << (2 * b)) | (((cy >> b) & 1) << (2 * b + 1))
    zb = jnp.clip(((1.0 - m_near) * 4.0).astype(jnp.int32), 0, 3)
    key = jnp.where(any_tri, zb * (1 << 20) + mo, jnp.int32(1 << 30))
    src_vm = jax.lax.broadcasted_iota(jnp.int32, (vm, 1), 0)[:, 0]
    _, perm = jax.lax.sort((key, src_vm), num_keys=1)  # (VM,) meshlet order

    # mask in meshlet order → compaction targets (index math only, no data)
    mask_o = tri_mask[perm].reshape(n)
    slots = jnp.cumsum(mask_o.astype(jnp.int32)) - 1
    count = jnp.maximum(slots[-1] + 1, 0)
    src_flat = (perm[:, None] * r + jax.lax.broadcasted_iota(jnp.int32, (vm, r), 1)).reshape(n)
    target = jnp.where(mask_o, slots, n)
    final_src = jnp.zeros((n,), jnp.int32).at[target].set(
        src_flat, mode="drop", unique_indices=True
    )
    valid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] < count

    # ---- ONE combined row gather of every per-triangle field ---------------
    n_attr = setup["attr_planes"].shape[2]
    cols = [
        setup["coeffs"].reshape(vm, r, 15),
        setup["attr_planes"].reshape(vm, r, n_attr * 3),
        jnp.stack([xmin, xmax, ymin, ymax, tz], axis=-1),
        jnp.broadcast_to(slot_material.astype(jnp.float32)[:, None, None], (vm, r, 1)),
        jnp.broadcast_to(slot_instance.astype(jnp.float32)[:, None, None], (vm, r, 1)),
        setup["packed_id"].astype(jnp.float32)[..., None],  # < 2^24, f32-exact
    ]
    n_row = 0
    if mat_rows is not None:
        n_row = mat_rows.shape[-1]
        rows_m = mat_rows[slot_material]  # (VM, 32) — table-sized gather, ~free
        cols.append(jnp.broadcast_to(rows_m[:, None, :], (vm, r, n_row)))
    combined = jnp.concatenate(cols, axis=-1).reshape(n, 15 + n_attr * 3 + 8 + n_row)
    d = combined[final_src]  # the one gather

    coeffs = jnp.where(valid[:, None], d[:, 0:15], 0.0)
    coeffs = coeffs.reshape(n, 5, 3)
    coeffs = coeffs.at[:, 0, 2].set(jnp.where(valid, coeffs[:, 0, 2], -1e30))
    attr_planes = jnp.where(valid[:, None], d[:, 15 : 15 + n_attr * 3], 0.0)
    o = 15 + n_attr * 3
    big = jnp.float32(1e9)
    xmin_d = jnp.where(valid, d[:, o + 0], big).reshape(n_groups, group)
    xmax_d = jnp.where(valid, d[:, o + 1], -big).reshape(n_groups, group)
    ymin_d = jnp.where(valid, d[:, o + 2], big).reshape(n_groups, group)
    ymax_d = jnp.where(valid, d[:, o + 3], -big).reshape(n_groups, group)
    tz_d = jnp.where(valid, d[:, o + 4], -1.0)
    mat_d = jnp.where(valid, d[:, o + 5].astype(jnp.int32), 0)
    inst_d = jnp.where(valid, d[:, o + 6].astype(jnp.int32), 0)
    pid_d = jnp.where(valid, d[:, o + 7].astype(jnp.int32), -1)

    out_rows = None
    if mat_rows is not None:
        out_rows = jnp.where(valid[:, None], d[:, o + 8 : o + 8 + n_row], 0.0)

    return {
        "coeffs": coeffs.reshape(n_groups, group, 5, 3),
        "attr_planes": attr_planes.reshape(n_groups, group, n_attr, 3),
        "tri_valid": valid.reshape(n_groups, group),
        "ml_xmin": jnp.min(xmin_d, axis=1),
        "ml_xmax": jnp.max(xmax_d, axis=1),
        "ml_ymin": jnp.min(ymin_d, axis=1),
        "ml_ymax": jnp.max(ymax_d, axis=1),
        "ml_near": jnp.max(tz_d.reshape(n_groups, group), axis=1),
        "slot_material": mat_d.reshape(n_groups, group),
        "slot_instance": inst_d.reshape(n_groups, group),
        "packed_id": pid_d.reshape(n_groups, group),
        "slot_rows": out_rows,  # (N, 32) dense per-slot material rows or None
        "count": count,
    }


def passthrough_groups(
    setup: dict,
    tri_mask: Array,       # (VM, 64)
    slot_material: Array,  # (VM,)
    slot_instance: Array,  # (VM,)
    mat_rows: Array | None = None,
):
    """Dense-group dict WITHOUT re-grouping: source meshlets ARE the raster
    groups. For scenes whose baked meshlets are already dense and screen-local
    (cube/sphere primitive scenes: ~50% fill after backface cull), the
    compaction's combined concat+gather chain costs more than the dead lanes
    it removes (~4.5 ms vs ~1 ms of raster — trace r5 frame3d), so the frame
    graph skips it (`RenderSpec.compact_raster=False`). Field layout matches
    `compact_triangles` so the raster + slot-table consumers are unchanged."""
    vm, r = tri_mask.shape
    xmin = jnp.clip(setup["tri_xmin"], 0.0, None)
    xmax = setup["tri_xmax"]
    ymin = jnp.clip(setup["tri_ymin"], 0.0, None)
    ymax = setup["tri_ymax"]
    tz = jnp.max(setup["sxyz"][..., 2], axis=-1)  # (VM, R) per-tri nearest z

    coeffs = jnp.where(tri_mask[..., None, None], setup["coeffs"], 0.0)
    coeffs = coeffs.at[..., 0, 2].set(
        jnp.where(tri_mask, coeffs[..., 0, 2], -1e30)
    )
    attr_planes = jnp.where(tri_mask[..., None, None], setup["attr_planes"], 0.0)
    out = {
        "coeffs": coeffs,
        "attr_planes": attr_planes,
        "tri_valid": tri_mask,
        "ml_xmin": jnp.min(jnp.where(tri_mask, xmin, 1e9), axis=1),
        "ml_xmax": jnp.max(jnp.where(tri_mask, xmax, -1e9), axis=1),
        "ml_ymin": jnp.min(jnp.where(tri_mask, ymin, 1e9), axis=1),
        "ml_ymax": jnp.max(jnp.where(tri_mask, ymax, -1e9), axis=1),
        "ml_near": jnp.max(jnp.where(tri_mask, tz, -1.0), axis=1),
        "slot_material": jnp.broadcast_to(slot_material[:, None], (vm, r)),
        "slot_instance": jnp.broadcast_to(slot_instance[:, None], (vm, r)),
        "packed_id": jnp.where(tri_mask, setup["packed_id"], -1),
        "slot_rows": None,
        "count": jnp.sum(tri_mask.astype(jnp.int32)),
        # per-TRIANGLE bounds + nearest z for triangle-level tile binning
        # (bin_triangles_per_tile) — the per-tile raster path
        "tri_xmin": jnp.where(tri_mask, setup["tri_xmin"], 1e9),
        "tri_xmax": jnp.where(tri_mask, setup["tri_xmax"], -1e9),
        "tri_ymin": jnp.where(tri_mask, setup["tri_ymin"], 1e9),
        "tri_ymax": jnp.where(tri_mask, setup["tri_ymax"], -1e9),
        "tri_z": jnp.where(tri_mask, tz, -1.0),
    }
    if mat_rows is not None:
        rows_m = mat_rows[slot_material]  # (VM, 32) — table-sized gather, ~free
        out["slot_rows"] = jnp.broadcast_to(
            rows_m[:, None, :], (vm, r, mat_rows.shape[-1])
        ).reshape(vm * r, mat_rows.shape[-1])
    return out


def passthrough_bounds(setup: dict, tri_mask: Array) -> dict:
    """Just the fields triangle binning consumes (group + per-tri bounds,
    validity) under a pass's triangle mask — the full `passthrough_groups`
    masks the (VM, 64, 9, 3) coefficient/attribute tensors too (~1 ms of
    selects per pass at sponza caps, trace r5), which per-pass binning never
    reads when the comb matrix is shared across passes (build_tile_comb)."""
    xmin = jnp.where(tri_mask, setup["tri_xmin"], 1e9)
    xmax = jnp.where(tri_mask, setup["tri_xmax"], -1e9)
    ymin = jnp.where(tri_mask, setup["tri_ymin"], 1e9)
    ymax = jnp.where(tri_mask, setup["tri_ymax"], -1e9)
    return {
        "tri_valid": tri_mask,
        "tri_xmin": xmin,
        "tri_xmax": xmax,
        "tri_ymin": ymin,
        "tri_ymax": ymax,
        "ml_xmin": jnp.min(xmin, axis=1),
        "ml_xmax": jnp.max(xmax, axis=1),
        "ml_ymin": jnp.min(ymin, axis=1),
        "ml_ymax": jnp.max(ymax, axis=1),
    }


def bin_triangles_per_tile(
    dense: dict,
    width: int,
    height: int,
    tile: int,
    k_groups: int,
    k2: int,
) -> tuple[Array, Array, Array]:
    """Per-tile TRIANGLE shortlists — the round-5 raster redesign.

    The group-hit kernel evaluates every slot of every binned group per tile:
    at sponza that is ~480 candidate slots/tile where only ~61 triangles
    actually overlap the tile (bbox-exact, measured r5) — 85% of the dominant
    VPU resolve was dead slots, and group/tile shape scans move it ≤5%
    (scan_sponza r5). This stage compacts, per tile, the triangles whose OWN
    screen bbox overlaps the tile into a dense entry list the loop-free
    per-tile kernel consumes (`rasterize_gbuffer_tiles`). This is the closest
    TPU analog of the reference's per-pixel HW raster touching only covered
    tiles (`visbuffer_encode.slang`).

    Two-level construction keeps every op at tractable shape:
      1. group (meshlet) bboxes → per-tile group lists (existing compare-
         reduce binning; `k_groups` cap);
      2. the K·R candidate space per tile is masked by per-TRIANGLE bbox
         overlap, then rank-compacted to `k2` dense entries with the same
         monotone-cumsum compare-reduce (u16 ranks — k2 ≤ 1024).
    Entry order preserves the front-to-back group order (depth-sorted culling
    upstream), so the kernel's round early-out stays effective.

    Returns (entries (T, k2) i32 — global flat slot id (g·R + r) or -1,
    counts (T,) i32 clipped to k2, overflow () i32 — dropped tile-triangle
    pairs; the bench gates assert it stays 0)."""
    g_list, g_ovf = bin_meshlets_to_tiles(dense, width, height, tile, k_groups)
    g_count, r = dense["tri_valid"].shape
    t_n = g_list.shape[0]
    tx = (width + tile - 1) // tile
    gl = jnp.maximum(g_list, 0)

    # per-candidate tri fields in ONE (T·K) row gather: [xmin xmax ymin ymax valid]·R
    fields = jnp.concatenate(
        [
            jnp.clip(dense["tri_xmin"], 0.0, float(width)),
            jnp.clip(dense["tri_xmax"], -1.0, float(width)),
            jnp.clip(dense["tri_ymin"], 0.0, float(height)),
            jnp.clip(dense["tri_ymax"], -1.0, float(height)),
            dense["tri_valid"].astype(jnp.float32),
        ],
        axis=1,
    )  # (G, 5R)
    cand = fields[gl]  # (T, K, 5R)
    k = g_list.shape[1]
    cx0 = cand[:, :, 0 * r : 1 * r].reshape(t_n, k * r)
    cx1 = cand[:, :, 1 * r : 2 * r].reshape(t_n, k * r)
    cy0 = cand[:, :, 2 * r : 3 * r].reshape(t_n, k * r)
    cy1 = cand[:, :, 3 * r : 4 * r].reshape(t_n, k * r)
    cv = cand[:, :, 4 * r : 5 * r].reshape(t_n, k * r) > 0.5

    tids = jnp.arange(t_n, dtype=jnp.int32)
    tile_x0 = ((tids % tx) * tile).astype(jnp.float32)[:, None]
    tile_y0 = ((tids // tx) * tile).astype(jnp.float32)[:, None]
    live_k = (g_list >= 0)[:, :, None]
    m = (
        (cx1 >= tile_x0) & (cx0 < tile_x0 + tile)
        & (cy1 >= tile_y0) & (cy0 < tile_y0 + tile)
        & cv
        & jnp.broadcast_to(live_k, (t_n, k, r)).reshape(t_n, k * r)
    )  # (T, K·R)

    cum = jnp.cumsum(m.astype(jnp.int32), axis=1)  # monotone per tile
    cnt_raw = cum[:, -1]
    # stage-1 group overflow also drops triangles — surface both
    overflow = jnp.sum(jnp.maximum(cnt_raw - k2, 0)) + g_ovf
    cnt = jnp.minimum(cnt_raw, k2)
    # entry j's source position = first n with cum == j+1; for a monotone row
    # that is Σ_n [cum_n < j+1] (the searchsorted-as-count trick of
    # bin_meshlets_to_tiles, u16 ranks for k2 up to 1024)
    ranks = jnp.arange(1, k2 + 1, dtype=jnp.uint16)
    cum_cl = jnp.minimum(cum, k2 + 1).astype(jnp.uint16)[:, :, None]
    pos = jnp.sum(
        (cum_cl < ranks[None, None, :]).astype(jnp.int32), axis=1
    )  # (T, k2)
    have = cnt_raw[:, None] >= ranks.astype(jnp.int32)[None, :]
    k_of = jnp.clip(pos // r, 0, k - 1)
    r_of = pos % r
    flat = jnp.take_along_axis(gl, k_of, axis=1) * r + r_of
    entries = jnp.where(have, flat, -1)
    return entries, cnt, overflow


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
    # entry k is the first index where cum reaches k+1. searchsorted on a
    # monotone row is just a count: searchsorted(row, r, left) = Σ_s [row_s < r]
    # — expressed as one fused compare-reduce instead of a vmapped binary search
    # (the while-loop form cost 17 ms/frame at 1080p; this is ~1 ms)
    cum = jnp.cumsum(overlap.astype(jnp.int32), axis=1)
    ranks = jnp.arange(1, k_per_tile + 1, dtype=jnp.int32)
    cum_cl = jnp.minimum(cum, k_per_tile + 1).astype(jnp.uint8)[:, :, None]
    tile_list = jnp.sum(
        (cum_cl < ranks[None, None, :].astype(jnp.uint8)).astype(jnp.int32), axis=1
    )
    tile_list = jnp.where(cum[:, -1:] >= ranks[None, :], tile_list, -1)
    overflow = jnp.sum(jnp.maximum(cum[:, -1] - k_per_tile, 0))
    return tile_list, overflow
