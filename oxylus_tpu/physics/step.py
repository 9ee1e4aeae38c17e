"""One fixed-timestep rigid-body substep: broadphase → narrowphase → solver → integrate.

TPU-first re-design of what the reference delegates to Jolt
(`JPH::PhysicsSystem::Update`, driven at `/root/reference/Oxylus/src/Scene/Scene.cpp:722-729`):

- broadphase: dense all-pairs AABB overlap (B×B bitmatrix) + fixed-capacity compaction —
  the quadtree is replaced by vectorized work the VPU does for free at these body counts.
- narrowphase: analytic contacts for box/capsule primitives (sphere = zero-length capsule),
  up to 4 manifold points per pair, fixed shapes everywhere.
- solver: mass-splitting projected Jacobi impulse iterations (the parallel-friendly
  equivalent of Jolt's sequential-impulse Gauss-Seidel), Baumgarte stabilization,
  Coulomb friction (geometric-mean combine), restitution (max combine) — Jolt's combine
  rules, so trajectories track the reference engine.
- integrate: semi-implicit Euler, quaternion exponential-map rotation update.

Everything is fixed-shape; overflowing pair capacity drops pairs (counted in the debug
stats) rather than reallocating.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import math3d
from .state import (
    BODY_DYNAMIC,
    BODY_STATIC,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_CYLINDER,
    SHAPE_MESH,
    PhysicsParams,
    PhysicsState,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Broadphase
# ---------------------------------------------------------------------------

def shape_local_halfbox(ps: PhysicsState) -> Array:
    """Conservative local-frame half extents of each collider."""
    box = ps.half_extent
    rmax = jnp.maximum(ps.radius, ps.radius2)  # radius2==0 → uniform radius
    cap = jnp.stack([rmax, ps.half_length + rmax, rmax], axis=-1)
    cyl = jnp.stack([ps.radius, ps.half_length, ps.radius], axis=-1)
    out = jnp.where((ps.shape_type == SHAPE_BOX)[:, None], box, cap)
    return jnp.where((ps.shape_type == SHAPE_CYLINDER)[:, None], cyl, out)


def world_aabbs(ps: PhysicsState, dt, margin) -> tuple[Array, Array]:
    rot = math3d.quat_to_mat3(ps.quat)  # (B,3,3)
    center = ps.pos + jnp.einsum("bij,bj->bi", rot, ps.offset)
    half = jnp.einsum("bij,bj->bi", jnp.abs(rot), shape_local_halfbox(ps))
    half = half + margin + jnp.abs(ps.linvel) * dt
    return center - half, center + half


def broadphase_pairs(ps: PhysicsState, params: PhysicsParams, dt) -> tuple[Array, Array, Array]:
    """All-pairs AABB overlap → compacted (ia, ib, valid) with capacity max_pairs.

    Replaces Jolt's quadtree broadphase with a dense (B,B) test: at the reference's
    1024-body capacity this is ~1M lane-ops, ideal VPU work, with a cumsum compaction
    in place of the indirect dispatch the GPU engine uses (SURVEY §2.8)."""
    b = ps.num_slots
    p = params.max_pairs
    bmin, bmax = world_aabbs(ps, dt, params.speculative_margin)

    overlap = jnp.all(
        (bmin[:, None, :] <= bmax[None, :, :]) & (bmin[None, :, :] <= bmax[:, None, :]),
        axis=-1,
    )
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    upper = ii < jj
    act = ps.active
    dyn = ps.body_type == BODY_DYNAMIC
    some_dynamic = dyn[:, None] | dyn[None, :]
    mask = overlap & upper & act[:, None] & act[None, :] & some_dynamic
    # mesh-collider slots only carry material; their geometry is the triangle
    # grid handled by mesh_contacts(), not the pair pipeline
    not_mesh = ps.shape_type != SHAPE_MESH
    mask = mask & not_mesh[:, None] & not_mesh[None, :]
    if ps.has_proxies:
        # sub-colliders of one compound never collide with each other or their root
        root = jnp.where(ps.parent >= 0, ps.parent, jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0])
        mask = mask & (root[:, None] != root[None, :])

    flat = mask.reshape(-1)
    slots = jnp.cumsum(flat.astype(jnp.int32)) - 1
    # compaction scatter: targets are unique by construction (cumsum), overflow and
    # non-pairs go out of range and are dropped — this lowers to a fast permutation
    # scatter on TPU instead of a serialized read-modify-write
    target = jnp.where(flat & (slots < p), slots, b * b)
    src = jax.lax.broadcasted_iota(jnp.int32, (b * b, 1), 0)[:, 0]
    pair_flat = jnp.zeros((p,), jnp.int32).at[target].set(src, mode="drop", unique_indices=True)
    count = jnp.minimum(jnp.sum(flat.astype(jnp.int32)), p)
    valid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0] < count
    ia = pair_flat // b
    ib = pair_flat % b
    return ia, ib, valid


# ---------------------------------------------------------------------------
# Narrowphase
# ---------------------------------------------------------------------------

def _closest_segment_segment(p1, q1, p2, q2, with_params: bool = False):
    """Closest points between segments [p1,q1], [p2,q2]; batched, branch-free."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    bb = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - bb * bb
    # degenerate segment 2 (a sphere): closest point on segment 1 to the point
    # p2 is s = -c/a — NOT 0 (the old fallback silently snapped capsule-vs-
    # sphere contacts to the capsule's bottom end)
    s_point = jnp.clip(-c / jnp.maximum(a, 1e-12), 0.0, 1.0)
    s = jnp.where(denom > 1e-12, jnp.clip((bb * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0), s_point)
    t = jnp.where(e > 1e-12, (bb * s + f) / jnp.maximum(e, 1e-12), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(e > 1e-12, jnp.clip((bb * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0), s)
    s = jnp.where(a > 1e-12, s, 0.0)
    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t_cl[..., None]
    if with_params:
        return c1, c2, s, t_cl
    return c1, c2


def _capsule_segment(center, rot, half_length):
    axis = rot[..., :, 1]  # local Y column
    e = axis * half_length[..., None]
    return center - e, center + e


def _contact_capsule_capsule(ca, ra_rot, hla, rad_a, rad2_a, cb, rb_rot, hlb, rad_b, rad2_b):
    """Swept-sphere vs swept-sphere. Tapered capsules (Jolt TaperedCapsuleShape =
    convex hull of the two end spheres) use the radius interpolated at the
    closest-point parameter — exact at the caps, conservative on the cone side."""
    p1, q1 = _capsule_segment(ca, ra_rot, hla)
    p2, q2 = _capsule_segment(cb, rb_rot, hlb)
    c1, c2, s, t = _closest_segment_segment(p1, q1, p2, q2, with_params=True)
    r_a = rad_a + (rad2_a - rad_a) * s  # segment runs bottom (-Y) → top (+Y)
    r_b = rad_b + (rad2_b - rad_b) * t
    d = c2 - c1
    dist = jnp.linalg.norm(d, axis=-1)
    # degenerate (concentric) fallback: push up
    safe = dist > 1e-9
    n = jnp.where(safe[..., None], d / jnp.maximum(dist, 1e-9)[..., None], jnp.array([0.0, 1.0, 0.0]))
    depth = r_a + r_b - dist
    point = (c1 + n * r_a[..., None] + c2 - n * r_b[..., None]) * 0.5
    return n, point, depth


def _point_box_signed(p_local, half):
    """Signed distance of a point to a box in box frame + outward closest feature.

    Returns (closest_local, normal_local, depth): depth > 0 means penetrating."""
    clamped = jnp.clip(p_local, -half, half)
    delta = p_local - clamped
    out_dist = jnp.linalg.norm(delta, axis=-1)
    outside = out_dist > 1e-9
    n_out = delta / jnp.maximum(out_dist, 1e-9)[..., None]
    # inside: push out along the axis of least penetration
    face_dist = half - jnp.abs(p_local)  # (..., 3) >= 0 when inside
    axis = jnp.argmin(face_dist, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(p_local, axis[..., None], axis=-1))[..., 0]
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n_in = jax.nn.one_hot(axis, 3, dtype=p_local.dtype) * sign[..., None]
    min_face = jnp.min(face_dist, axis=-1)
    inside_closest = p_local + n_in * min_face[..., None]
    closest = jnp.where(outside[..., None], clamped, inside_closest)
    normal = jnp.where(outside[..., None], n_out, n_in)
    depth = jnp.where(outside, -out_dist, min_face)
    return closest, normal, depth


def _contact_box_capsule(cb_box, rot_box, half, cc, rot_cap, hl, rad, rad2, k_points):
    """Box (a) vs capsule/sphere/tapered-capsule (b): sample points along the
    segment (radius interpolated bottom→top for tapered shapes), closest-feature
    test in box frame. Exact for spheres. Normal points a→b."""
    p2, q2 = _capsule_segment(cc, rot_cap, hl)
    ts = jnp.linspace(0.0, 1.0, 3)
    normals, points, depths = [], [], []
    for t in ts:
        sp = p2 + (q2 - p2) * t  # sample point on segment, world
        r_t = rad + (rad2 - rad) * t
        local = jnp.einsum("...ji,...j->...i", rot_box, sp - cb_box)  # R^T (p - c)
        closest_l, n_l, sd = _point_box_signed(local, half)
        n_w = jnp.einsum("...ij,...j->...i", rot_box, n_l)
        surf = cb_box + jnp.einsum("...ij,...j->...i", rot_box, closest_l)
        depth = sd + r_t  # sd negative outside: depth = rad - dist
        point = (surf + (sp - n_w * r_t[..., None])) * 0.5
        normals.append(n_w)
        points.append(point)
        depths.append(depth)
    n = jnp.stack(normals, axis=-2)  # (P, 3, 3)
    pt = jnp.stack(points, axis=-2)
    dp = jnp.stack(depths, axis=-1)
    pad = k_points - 3
    if pad > 0:
        n = jnp.concatenate([n, jnp.zeros_like(n[..., :pad, :])], axis=-2)
        pt = jnp.concatenate([pt, jnp.zeros_like(pt[..., :pad, :])], axis=-2)
        dp = jnp.concatenate([dp, jnp.full_like(dp[..., :pad], -1e9)], axis=-1)
    # a sphere only needs one sample; drop the duplicate ends
    dup = (hl[..., None] <= 1e-6) & (jax.lax.broadcasted_iota(jnp.int32, dp.shape, dp.ndim - 1) > 0)
    dp = jnp.where(dup, -1e9, dp)
    return n, pt, dp


def _contact_box_cylinder(cb_box, rot_box, half, cc, rot_cyl, hl, rad, k_points):
    """Box (a) vs flat-capped cylinder (b), axis = cylinder local Y.

    Branch-free candidate sampling (the TPU-shaped stand-in for GJK): the near
    cap's rim is sampled at 4 quadrature directions (±d̂, ±axis×d̂ where d̂ points
    at the box) as zero-radius point-box tests — these give cap-resting and
    rim-edge contacts with ≥2-point manifolds; two interior segment samples with
    sphere radius r cover side (lying-down) contact. Deepest k kept."""
    axis = rot_cyl[..., :, 1]
    to_box = cb_box - cc
    cap_sign = jnp.sign(jnp.sum(to_box * axis, axis=-1))
    cap_sign = jnp.where(cap_sign == 0.0, 1.0, cap_sign)
    near_cap = cc + axis * (cap_sign * hl)[..., None]

    # rim direction toward the box, orthogonal to the axis
    d_perp = to_box - jnp.sum(to_box * axis, axis=-1, keepdims=True) * axis
    d_len = jnp.linalg.norm(d_perp, axis=-1, keepdims=True)
    fallback = rot_cyl[..., :, 0]  # arbitrary radial direction when coaxial
    d_hat = jnp.where(d_len > 1e-6, d_perp / jnp.maximum(d_len, 1e-6), fallback)
    t_hat = jnp.cross(axis, d_hat)

    candidates = []  # (point, radius) — radius 0 for rim points (true hull edge)
    for dirn, sgn in ((d_hat, 1.0), (d_hat, -1.0), (t_hat, 1.0), (t_hat, -1.0)):
        candidates.append((near_cap + dirn * (sgn * rad)[..., None], jnp.zeros_like(rad)))
    p_bot = cc - axis * hl[..., None]
    p_top = cc + axis * hl[..., None]
    for t in (0.3, 0.7):  # interior side samples (sphere of radius r on the axis)
        candidates.append((p_bot + (p_top - p_bot) * t, rad))

    normals, points, depths = [], [], []
    for sp, r_s in candidates:
        local = jnp.einsum("...ji,...j->...i", rot_box, sp - cb_box)
        closest_l, n_l, sd = _point_box_signed(local, half)
        n_w = jnp.einsum("...ij,...j->...i", rot_box, n_l)
        surf = cb_box + jnp.einsum("...ij,...j->...i", rot_box, closest_l)
        depth = sd + r_s
        point = (surf + (sp - n_w * r_s[..., None])) * 0.5
        normals.append(n_w)
        points.append(point)
        depths.append(depth)
    n = jnp.stack(normals, axis=-2)   # (P, 6, 3)
    pt = jnp.stack(points, axis=-2)
    dp = jnp.stack(depths, axis=-1)   # (P, 6)
    top_dp, top_idx = jax.lax.top_k(dp, k_points)
    top_pt = jnp.take_along_axis(pt, top_idx[..., None].astype(jnp.int32), axis=-2)
    top_n = jnp.take_along_axis(n, top_idx[..., None].astype(jnp.int32), axis=-2)
    return top_n, top_pt, top_dp


_BOX_CORNERS = jnp.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
    jnp.float32,
)  # (8, 3)


def _contact_box_box(ca, rot_a, half_a, cb, rot_b, half_b, k_points):
    """Box-box: full 15-axis SAT (6 face axes + 9 edge-cross axes, the same axis set
    Jolt's convex SAT fallback and any exact OBB test use).

    Face-axis winner → corner manifold from the deepest corners of each box inside
    the other (up to k_points). Edge-axis winner → single contact at the closest
    point between the two supporting edges (tumbling / edge-balanced boxes resolve
    with the true edge normal instead of a face normal).
    """
    d = cb - ca  # (P,3)

    # 6 candidate face axes in world space: a's columns then b's columns
    axes = jnp.concatenate([jnp.moveaxis(rot_a, -1, -2), jnp.moveaxis(rot_b, -1, -2)], axis=-2)  # (P,6,3)
    # 9 edge-cross axes: a_i × b_j (normalized; degenerate parallel pairs masked out)
    a_cols = jnp.moveaxis(rot_a, -1, -2)  # (P,3,3) rows = a's axes
    b_cols = jnp.moveaxis(rot_b, -1, -2)
    cross = jnp.cross(a_cols[..., :, None, :], b_cols[..., None, :, :])  # (P,3,3,3)
    cross = cross.reshape(cross.shape[:-3] + (9, 3))
    cross_len = jnp.linalg.norm(cross, axis=-1)
    cross_ok = cross_len > 1e-6
    cross_n = cross / jnp.maximum(cross_len, 1e-6)[..., None]
    axes = jnp.concatenate([axes, cross_n], axis=-2)  # (P,15,3)

    # projection radius of a box onto axis L: Σ_j |(R^T L)_j| h_j
    axes_in_a = jnp.einsum("...ni,...ij->...nj", axes, rot_a)  # (P,15,3)
    axes_in_b = jnp.einsum("...ni,...ij->...nj", axes, rot_b)
    proj_a = jnp.einsum("...nj,...j->...n", jnp.abs(axes_in_a), half_a)
    proj_b = jnp.einsum("...nj,...j->...n", jnp.abs(axes_in_b), half_b)
    dist_on_axis = jnp.abs(jnp.einsum("...ki,...i->...k", axes, d))
    overlap = proj_a + proj_b - dist_on_axis  # (P,15)
    # degenerate cross axes can't separate or win; bias edge axes slightly so a
    # face axis wins ties (stable manifolds beat single edge points when flush)
    edge_slot = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, overlap.ndim - 1) >= 6
    ok = jnp.concatenate([jnp.ones_like(cross_ok[..., :6]), cross_ok], axis=-1)
    overlap_sep = jnp.where(ok, overlap, jnp.inf)
    separated = jnp.any(overlap_sep < 0.0, axis=-1)
    overlap_pick = jnp.where(ok, overlap + jnp.where(edge_slot, 1e-4, 0.0), jnp.inf)
    best = jnp.argmin(overlap_pick, axis=-1)
    best_is_edge = best >= 6
    n = jnp.take_along_axis(axes, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # orient a→b
    n = n * jnp.sign(jnp.sum(n * d, axis=-1, keepdims=True) + 1e-12)

    # support radii of both boxes along the chosen axis
    s_a = jnp.take_along_axis(proj_a, best[..., None].astype(jnp.int32), axis=-1)[..., 0]
    s_b = jnp.take_along_axis(proj_b, best[..., None].astype(jnp.int32), axis=-1)[..., 0]

    # candidate points: corners of b tested against a, and corners of a against b
    local_corners_b = _BOX_CORNERS[None, :, :] * half_b[..., None, :]  # (P,8,3)
    local_corners_a = _BOX_CORNERS[None, :, :] * half_a[..., None, :]
    corners_b = cb[..., None, :] + jnp.einsum("...ij,...kj->...ki", rot_b, local_corners_b)
    corners_a = ca[..., None, :] + jnp.einsum("...ij,...kj->...ki", rot_a, local_corners_a)

    def corner_inclusion(corners, box_c, box_rot, box_half):
        """Signed distance of corners into the other box (>0 inside) — used as a
        lateral inclusion filter, NOT as penetration depth."""
        local = jnp.einsum("...ji,...kj->...ki", box_rot, corners - box_c[..., None, :])
        _, _, sd = _point_box_signed(local, box_half[..., None, :])
        return sd

    inc_b = corner_inclusion(corners_b, ca, rot_a, half_a)  # (P,8)
    inc_a = corner_inclusion(corners_a, cb, rot_b, half_b)  # (P,8)

    # penetration measured ALONG the SAT normal against the opposing face's support
    # plane (corner min-face distance would be wrong for flush, equal-size boxes):
    #   corners of b vs a's face plane {x : (x-ca)·n = s_a}
    #   corners of a vs b's face plane {x : (x-cb)·(-n) = s_b}
    dp_b = s_a[..., None] - jnp.einsum("...ki,...i->...k", corners_b - ca[..., None, :], n)
    dp_a = s_b[..., None] + jnp.einsum("...ki,...i->...k", corners_a - cb[..., None, :], n)

    eps = 1e-3
    dp_b = jnp.where(inc_b > -eps, dp_b, -1e9)
    dp_a = jnp.where(inc_a > -eps, dp_a, -1e9)
    cand_pts = jnp.concatenate([corners_b, corners_a], axis=-2)  # (P,16,3)
    cand_dp = jnp.concatenate([dp_b, dp_a], axis=-1)  # (P,16)
    cand_dp = jnp.where(separated[..., None], -1e9, cand_dp)

    # top-k deepest
    top_dp, top_idx = jax.lax.top_k(cand_dp, k_points)
    top_pts = jnp.take_along_axis(cand_pts, top_idx[..., None].astype(jnp.int32), axis=-2)

    # --- edge-edge contact (winner axis ≥ 6): closest point between the two
    # supporting edges, single manifold point with the cross-axis normal
    ei = jnp.maximum(best - 6, 0) // 3  # a's edge direction axis
    ej = jnp.maximum(best - 6, 0) % 3   # b's edge direction axis
    axis_a = jnp.take_along_axis(a_cols, ei[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    axis_b = jnp.take_along_axis(b_cols, ej[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]

    def support_edge(c, cols, half, ax_idx, toward):
        """Edge of the box most along `toward`, directed along axis ax_idx."""
        sgn = jnp.sign(jnp.einsum("...ki,...i->...k", cols, toward))
        sgn = jnp.where(sgn == 0.0, 1.0, sgn)
        onehot = jax.nn.one_hot(ax_idx, 3, dtype=c.dtype)  # (...,3) over axes
        mid = c + jnp.einsum("...k,...ki->...i", sgn * half * (1.0 - onehot), cols)
        h_i = jnp.sum(half * onehot, axis=-1)
        dirv = jnp.einsum("...k,...ki->...i", onehot, cols)
        return mid - dirv * h_i[..., None], mid + dirv * h_i[..., None]

    pa0, pa1 = support_edge(ca, a_cols, half_a, ei, n)
    pb0, pb1 = support_edge(cb, b_cols, half_b, ej, -n)
    ea_c, eb_c = _closest_segment_segment(pa0, pa1, pb0, pb1)
    edge_pt = (ea_c + eb_c) * 0.5
    edge_dp = jnp.take_along_axis(overlap, best[..., None].astype(jnp.int32), axis=-1)[..., 0]
    edge_dp = jnp.where(separated, -1e9, edge_dp)

    use_edge = (best_is_edge & ~separated)[..., None]
    slot0 = jax.lax.broadcasted_iota(jnp.int32, top_dp.shape, top_dp.ndim - 1) == 0
    top_dp = jnp.where(use_edge, jnp.where(slot0, edge_dp[..., None], -1e9), top_dp)
    top_pts = jnp.where(use_edge[..., None], edge_pt[..., None, :], top_pts)

    # all manifold points share the SAT normal; depth measured per corner
    n_k = jnp.broadcast_to(n[..., None, :], top_pts.shape)
    return n_k, top_pts, top_dp


def mesh_contacts(ps: PhysicsState, params: PhysicsParams):
    """Per-body contacts against the static triangle-mesh world (Jolt MeshShape
    analog, `Scene.cpp:1717-1850`): one XZ-grid bucket gather per body, then
    sample-vs-triangle-plane tests — boxes by their 8 corners, swept-sphere
    shapes by 3 segment samples with the local radius. One-sided (CCW outward
    normal). Returns a contact stream shaped like narrowphase()'s:
    (normal, point, depth, valid, c_ia, c_ib) flattened to (B·k,)."""
    k = params.points_per_pair
    b = ps.num_slots
    tri = ps.mesh_tri                      # (T, 3, 3)
    grid = ps.mesh_grid                    # (C, K_tri)
    meta = ps.mesh_grid_meta
    k_tri = grid.shape[1]

    rot = math3d.quat_to_mat3(ps.quat)
    center = ps.pos + jnp.einsum("bij,bj->bi", rot, ps.offset)

    # body surface samples (B, S, 3) + per-sample swept radius (B, S)
    corners = jnp.einsum(
        "bij,bsj->bsi", rot, _BOX_CORNERS[None, :, :] * ps.half_extent[:, None, :]
    ) + center[:, None, :]                                   # (B, 8, 3)
    p1, q1 = _capsule_segment(center, rot, ps.half_length)
    ts = jnp.linspace(0.0, 1.0, 3)
    seg = p1[:, None, :] + (q1 - p1)[:, None, :] * ts[None, :, None]  # (B, 3, 3)
    rad2 = jnp.where(ps.radius2 > 0.0, ps.radius2, ps.radius)
    seg_r = ps.radius[:, None] + (rad2 - ps.radius)[:, None] * ts[None, :]
    is_box = (ps.shape_type == SHAPE_BOX)[:, None]
    samples = jnp.where(
        is_box[..., None], corners,
        jnp.concatenate([seg, jnp.broadcast_to(seg[:, :1], (b, 5, 3))], axis=1),
    )                                                        # (B, 8, 3)
    radii = jnp.where(
        is_box, jnp.zeros((b, 8)),
        jnp.concatenate([seg_r, jnp.full((b, 5), -1e9)], axis=1),
    )                                                        # (B, 8); -1e9 kills dups
    s_n = samples.shape[1]

    # candidate triangles from the body's XZ grid cell
    ox, oz, cell, gxf, gzf = meta[0], meta[1], meta[2], meta[3], meta[4]
    cx = jnp.clip(jnp.floor((center[:, 0] - ox) / cell), 0, gxf - 1.0).astype(jnp.int32)
    cz = jnp.clip(jnp.floor((center[:, 2] - oz) / cell), 0, gzf - 1.0).astype(jnp.int32)
    tids = grid[cz * gxf.astype(jnp.int32) + cx]             # (B, K_tri)
    t_ok = tids >= 0
    tv = tri[jnp.maximum(tids, 0)]                           # (B, K_tri, 3, 3)
    va, vb, vc = tv[:, :, 0], tv[:, :, 1], tv[:, :, 2]
    e1 = vb - va
    e2 = vc - va
    nrm = jnp.cross(e1, e2)
    nl = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    n_t = nrm / jnp.maximum(nl, 1e-9)                        # (B, K_tri, 3)

    rel = samples[:, None, :, :] - va[:, :, None, :]          # (B, K_tri, S, 3)
    d = jnp.sum(rel * n_t[:, :, None, :], axis=-1)            # (B, K_tri, S)
    proj = samples[:, None, :, :] - d[..., None] * n_t[:, :, None, :]

    # lateral tolerance: projecting along the face normal shifts a sample that
    # sits above an EDGE seam outside both neighboring faces by |d|·n_lateral —
    # admit contacts within (sample radius + shift)-proportional distance of the
    # edge or the seam between two faces becomes a crack bodies fall through
    tol = radii[:, None, :] * 0.5 + 0.03 + jnp.abs(d) * 0.35  # (B, K_tri, S)

    def edge_ok(v0, v1):
        ev = v1 - v0
        inv_len = 1.0 / jnp.maximum(jnp.linalg.norm(ev, axis=-1, keepdims=True), 1e-9)
        pv = proj - v0[:, :, None, :]
        lat = jnp.sum(jnp.cross(ev[:, :, None, :], pv) * n_t[:, :, None, :], axis=-1)
        return lat * inv_len >= -tol

    inside = edge_ok(va, vb) & edge_ok(vb, vc) & edge_ok(vc, va)
    depth = radii[:, None, :] - d                            # (B, K_tri, S)
    max_pen = 0.35  # don't grab geometry far below the surface (tunneled bodies)
    valid = (
        inside & t_ok[..., None]
        & (depth > -params.speculative_margin) & (depth < max_pen)
    )
    depth_m = jnp.where(valid, depth, -1e9)

    # deepest k contacts per body
    flat_dp = depth_m.reshape(b, k_tri * s_n)
    top_dp, top_i = jax.lax.top_k(flat_dp, k)
    gi = top_i[..., None]
    top_pt = jnp.take_along_axis(proj.reshape(b, k_tri * s_n, 3), gi, axis=1)
    top_n = jnp.take_along_axis(
        jnp.broadcast_to(n_t[:, :, None, :], (b, k_tri, s_n, 3)).reshape(b, k_tri * s_n, 3),
        gi, axis=1,
    )

    dyn = (ps.body_type == BODY_DYNAMIC) & ps.active
    c_valid = (top_dp > -1e8) & dyn[:, None]
    c_ia = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    c_ib = jnp.full((b * k,), ps.mesh_body, jnp.int32)
    # normal convention is a→b (body→mesh) = -triangle normal
    return (
        (-top_n).reshape(b * k, 3),
        top_pt.reshape(b * k, 3),
        top_dp.reshape(b * k),
        c_valid.reshape(b * k),
        c_ia,
        c_ib,
    )


def narrowphase(ps: PhysicsState, params: PhysicsParams, ia: Array, ib: Array, pair_valid: Array):
    """Vectorized contact generation. Returns per-contact-point arrays flattened to
    (P*K,): normal (a→b), point, depth, valid, plus pair index mapping."""
    k = params.points_per_pair
    rot = math3d.quat_to_mat3(ps.quat)
    center = ps.pos + jnp.einsum("bij,bj->bi", rot, ps.offset)

    g = lambda arr, idx: arr[idx]
    ca, cb = g(center, ia), g(center, ib)
    ra, rb = g(rot, ia), g(rot, ib)
    ha, hb = g(ps.half_extent, ia), g(ps.half_extent, ib)
    rad_a, rad_b = g(ps.radius, ia), g(ps.radius, ib)
    hla, hlb = g(ps.half_length, ia), g(ps.half_length, ib)
    ta, tb = g(ps.shape_type, ia), g(ps.shape_type, ib)

    p = ia.shape[0]
    # radius2 == 0 means "uniform" (state built outside build.py, e.g. tests
    # filling host arrays directly) — fall back to the primary radius
    rad2 = jnp.where(ps.radius2 > 0.0, ps.radius2, ps.radius)
    rad2_a, rad2_b = g(rad2, ia), g(rad2, ib)

    # round-round (capsule/sphere/tapered; cylinders degrade to capsules here —
    # exact cylinder support is the box-cylinder path below)
    n_cc, pt_cc, dp_cc = _contact_capsule_capsule(
        ca, ra, hla, rad_a, rad2_a, cb, rb, hlb, rad_b, rad2_b
    )
    n_cc = jnp.broadcast_to(n_cc[:, None, :], (p, k, 3))
    pt_cc = jnp.broadcast_to(pt_cc[:, None, :], (p, k, 3))
    dp_cc = jnp.concatenate([dp_cc[:, None], jnp.full((p, k - 1), -1e9)], axis=-1)

    # box(a)-capsule(b) and capsule(a)-box(b)
    n_bc, pt_bc, dp_bc = _contact_box_capsule(ca, ra, ha, cb, rb, hlb, rad_b, rad2_b, k)
    n_cb, pt_cb, dp_cb = _contact_box_capsule(cb, rb, hb, ca, ra, hla, rad_a, rad2_a, k)
    n_cb = -n_cb  # flip so normal is a→b

    # box(a)-cylinder(b) and cylinder(a)-box(b)
    n_bcy, pt_bcy, dp_bcy = _contact_box_cylinder(ca, ra, ha, cb, rb, hlb, rad_b, k)
    n_cyb, pt_cyb, dp_cyb = _contact_box_cylinder(cb, rb, hb, ca, ra, hla, rad_a, k)
    n_cyb = -n_cyb

    # box-box
    n_bb, pt_bb, dp_bb = _contact_box_box(ca, ra, ha, cb, rb, hb, k)

    a_box = (ta == SHAPE_BOX)[:, None]
    b_box = (tb == SHAPE_BOX)[:, None]
    a_cyl = (ta == SHAPE_CYLINDER)[:, None]
    b_cyl = (tb == SHAPE_CYLINDER)[:, None]

    def sel(cc, bc, cb_, bb, bcy, cyb):
        def w(mask, val, out):
            return jnp.where(mask[..., None] if cc.ndim == 3 else mask, val, out)

        out = w((~a_box) & (~b_box), cc, bb)       # round/cyl vs round/cyl
        out = w(a_box & (~b_box), bc, out)          # box vs round
        out = w((~a_box) & b_box, cb_, out)         # round vs box
        out = w(a_box & b_cyl, bcy, out)            # box vs cylinder (exact caps)
        out = w(a_cyl & b_box, cyb, out)            # cylinder vs box
        return out

    normal = sel(n_cc, n_bc, n_cb, n_bb, n_bcy, n_cyb)  # (P,K,3)
    point = sel(pt_cc, pt_bc, pt_cb, pt_bb, pt_bcy, pt_cyb)
    depth = sel(dp_cc, dp_bc, dp_cb, dp_bb, dp_bcy, dp_cyb)  # (P,K)

    sensor = g(ps.is_sensor, ia) | g(ps.is_sensor, ib)
    valid = (
        (depth > -params.speculative_margin)
        & pair_valid[:, None]
        & ~sensor[:, None]
    )
    touching = jnp.any((depth > 0.0) & pair_valid[:, None] & ~(g(ps.is_sensor, ia) & g(ps.is_sensor, ib))[:, None], axis=-1)

    # flatten (P,K) → (P*K,)
    c_ia = jnp.repeat(ia, k)
    c_ib = jnp.repeat(ib, k)
    return (
        normal.reshape(p * k, 3),
        point.reshape(p * k, 3),
        depth.reshape(p * k),
        valid.reshape(p * k),
        c_ia,
        c_ib,
        touching,
    )


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------

def _world_inv_inertia(ps: PhysicsState) -> Array:
    rot = math3d.quat_to_mat3(ps.quat)
    return jnp.einsum("bij,bj,bkj->bik", rot, ps.inv_inertia, rot)


def make_segment_reducer(idx: Array, num_segments: int):
    """Sort-based segmented sum: TPU-friendly replacement for scatter-add.

    Scatter-add with duplicate indices serializes on TPU; instead we sort the contact
    rows by body index ONCE, and each reduction becomes gather → cumsum → boundary
    differences — all vectorizable. Returns reduce(values (C, …)) → (num_segments, …).
    """
    c = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    sorted_idx, order = jax.lax.sort((idx, iota), num_keys=1)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (num_segments, 1), 0)[:, 0]
    ends = jnp.searchsorted(sorted_idx, seg_ids, side="right")
    starts = jnp.searchsorted(sorted_idx, seg_ids, side="left")

    def reduce(values: Array) -> Array:
        v = values[order]
        csum = jnp.cumsum(v, axis=0)
        zero = jnp.zeros((1,) + v.shape[1:], v.dtype)
        csum = jnp.concatenate([zero, csum], axis=0)
        return csum[ends] - csum[starts]

    return reduce


# vec3 as tuple-of-(C,)-arrays: every op uses full 128-wide lanes, unlike (C, 3)
# layouts that leave 125 of 128 lanes idle (the dominant cost in the first cut).

def _split3(v: Array):
    return (v[..., 0], v[..., 1], v[..., 2])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def solve_velocity(
    ps: PhysicsState,
    params: PhysicsParams,
    dt,
    normal: Array,
    point: Array,
    depth: Array,
    valid: Array,
    c_ia: Array,
    c_ib: Array,
) -> tuple[Array, Array]:
    """Mass-splitting projected-Jacobi impulse solver. Returns (linvel, angvel).

    Communication strategy (measured on-chip, scripts/micro_probe.py): every distinct
    non-fusable XLA op costs ~100-300us on this target regardless of size, so the
    per-iteration contact<->body exchange is reduced to PAIR granularity and done with
    two incidence matmuls per side on the MXU: a one-hot (P, B) matrix gathers body
    velocities as `G @ V` and reduces summed pair impulses as `G^T @ J`. All per-point
    manifold math (K points per pair) lives inside one fused elementwise chain."""
    b = ps.num_slots
    k = params.points_per_pair
    p_pairs = c_ia.shape[0] // k
    inv_iw = _world_inv_inertia(ps)  # (B,3,3)

    # reshape per-point data to (P, K, ...)
    normal = normal.reshape(p_pairs, k, 3)
    point = point.reshape(p_pairs, k, 3)
    depth = depth.reshape(p_pairs, k)
    valid = valid.reshape(p_pairs, k)
    ia = c_ia.reshape(p_pairs, k)[:, 0]
    ib = c_ib.reshape(p_pairs, k)[:, 0]
    if ps.has_proxies:
        # contacts on sub-collider proxies resolve against the compound ROOT: its
        # mass, its velocity, torque about its COM, impulses applied to it
        root = jnp.where(ps.parent >= 0, ps.parent, jnp.arange(b, dtype=jnp.int32))
        ia = root[ia]
        ib = root[ib]
    pair_valid = jnp.any(valid, axis=1)
    validf = valid.astype(jnp.float32)

    if params.comm == "matmul":
        # pair-level incidence matrices: G[pair, body] = 1 for valid pairs
        bodies = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        g_a = ((ia[:, None] == bodies) & pair_valid[:, None]).astype(jnp.float32)  # (P, B)
        g_b = ((ib[:, None] == bodies) & pair_valid[:, None]).astype(jnp.float32)

        def reduce_sides(vals_a: Array, vals_b: Array) -> Array:
            """(P, F) per side -> (B, F): Gb^T vals_b - Ga^T vals_a."""
            return jnp.einsum("pb,pf->bf", g_b, vals_b) - jnp.einsum("pb,pf->bf", g_a, vals_a)

        def gather_vel6(v6: Array):
            return (
                jnp.dot(g_a, v6, preferred_element_type=jnp.float32),
                jnp.dot(g_b, v6, preferred_element_type=jnp.float32),
            )

        # per-body contact-point counts -> mass splitting factors
        point_count = jnp.sum(validf, axis=1)  # (P,)
        cnt = jnp.einsum("pb,p->b", g_a, point_count) + jnp.einsum("pb,p->b", g_b, point_count)
    else:  # "scatter": memory-light 1-D gather + scatter-add (vmapped-worlds path)
        ia_safe = jnp.where(pair_valid, ia, b)  # out of range → dropped
        ib_safe = jnp.where(pair_valid, ib, b)

        def reduce_sides(vals_a: Array, vals_b: Array) -> Array:
            out = jnp.zeros((b, vals_a.shape[-1]), vals_a.dtype)
            out = out.at[ib_safe].add(vals_b, mode="drop")
            out = out.at[ia_safe].add(-vals_a, mode="drop")
            return out

        def gather_vel6(v6: Array):
            return v6[jnp.minimum(ia, b - 1)], v6[jnp.minimum(ib, b - 1)]

        point_count = jnp.sum(validf, axis=1)
        cnt = (
            jnp.zeros((b,), jnp.float32).at[ia_safe].add(point_count, mode="drop")
            + jnp.zeros((b,), jnp.float32).at[ib_safe].add(point_count, mode="drop")
        )
    split = jnp.maximum(cnt, 1.0)

    g = lambda arr, idx: arr[idx]
    im_a = g(ps.inv_mass * split, ia)[:, None]          # (P,1)
    im_b = g(ps.inv_mass * split, ib)[:, None]
    ii_a = g(inv_iw * split[:, None, None], ia)          # (P,3,3)
    ii_b = g(inv_iw * split[:, None, None], ib)
    r_a = point - g(ps.pos, ia)[:, None, :]              # (P,K,3)
    r_b = point - g(ps.pos, ib)[:, None, :]

    def k_along(dirn: Array) -> Array:                   # dirn (P,K,3) -> (P,K)
        rxn_a = jnp.cross(r_a, dirn)
        rxn_b = jnp.cross(r_b, dirn)
        ang_a = jnp.sum(jnp.einsum("pij,pkj->pki", ii_a, rxn_a) * rxn_a, axis=-1)
        ang_b = jnp.sum(jnp.einsum("pij,pkj->pki", ii_b, rxn_b) * rxn_b, axis=-1)
        return im_a + im_b + ang_a + ang_b

    kn = jnp.maximum(k_along(normal), 1e-9)

    # tangent basis per point
    up = jnp.abs(normal[..., 1:2]) < 0.9
    ref = jnp.where(up, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = jnp.cross(normal, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(normal, t1)
    kt1 = jnp.maximum(k_along(t1), 1e-9)
    kt2 = jnp.maximum(k_along(t2), 1e-9)

    # combine rules (Jolt defaults): restitution max, friction geometric mean
    e = jnp.maximum(g(ps.restitution, ia), g(ps.restitution, ib))[:, None]
    mu = jnp.sqrt(g(ps.friction, ia) * g(ps.friction, ib))[:, None]

    def rel_vel(va6: Array, vb6: Array) -> Array:        # (P,6) each -> (P,K,3)
        va = va6[:, None, :3] + jnp.cross(va6[:, None, 3:], r_a)
        vb = vb6[:, None, :3] + jnp.cross(vb6[:, None, 3:], r_b)
        return vb - va

    v6_0 = jnp.concatenate([ps.linvel, ps.angvel], axis=-1)  # (B,6)
    va6_0, vb6_0 = gather_vel6(v6_0)
    vn0 = jnp.sum(rel_vel(va6_0, vb6_0) * normal, axis=-1)   # (P,K)
    bounce = jnp.where(vn0 < -params.restitution_threshold, -e * vn0, 0.0)
    bias = (params.baumgarte / dt) * jnp.maximum(depth - params.penetration_slop, 0.0)
    target = jnp.maximum(bounce, bias)

    dof6 = jnp.concatenate([ps.dof_mask_lin, ps.dof_mask_ang], axis=-1)  # (B,6)
    inv_mass = ps.inv_mass

    def body(_, carry):
        v6, acc_n, acc_t1, acc_t2 = carry
        va6, vb6 = gather_vel6(v6)  # 2 MXU kernels
        vrel = rel_vel(va6, vb6)    # (P,K,3)
        vn = jnp.sum(vrel * normal, axis=-1)
        dl = -(vn - target) / kn
        new_acc = jnp.maximum(acc_n + dl, 0.0)
        dl = jnp.where(valid, new_acc - acc_n, 0.0)
        acc_n = jnp.where(valid, new_acc, acc_n)

        vt1 = jnp.sum(vrel * t1, axis=-1)
        vt2 = jnp.sum(vrel * t2, axis=-1)
        max_f = mu * acc_n
        new_t1 = jnp.clip(acc_t1 - vt1 / kt1, -max_f, max_f)
        new_t2 = jnp.clip(acc_t2 - vt2 / kt2, -max_f, max_f)
        dt1 = jnp.where(valid, new_t1 - acc_t1, 0.0)
        dt2 = jnp.where(valid, new_t2 - acc_t2, 0.0)
        acc_t1 = jnp.where(valid, new_t1, acc_t1)
        acc_t2 = jnp.where(valid, new_t2, acc_t2)

        # per-point impulses folded to pair level inside the fused chain
        j = normal * dl[..., None] + t1 * dt1[..., None] + t2 * dt2[..., None]  # (P,K,3)
        j_pair = jnp.sum(j, axis=1)                     # (P,3) net impulse on b
        tq_a = jnp.sum(jnp.cross(r_a, j), axis=1)       # (P,3)
        tq_b = jnp.sum(jnp.cross(r_b, j), axis=1)
        d6 = reduce_sides(
            jnp.concatenate([j_pair, tq_a], axis=-1),
            jnp.concatenate([j_pair, tq_b], axis=-1),
        )  # (B,6): [net impulse | net torque]
        dlv = d6[:, :3] * inv_mass[:, None]
        dav = jnp.einsum("bij,bj->bi", inv_iw, d6[:, 3:])
        v6 = v6 + jnp.concatenate([dlv, dav], axis=-1) * dof6
        return v6, acc_n, acc_t1, acc_t2

    zeros = jnp.zeros_like(depth)
    out = jax.lax.fori_loop(
        0, params.velocity_iterations, body, (v6_0, zeros, zeros, zeros)
    )
    v6 = out[0]
    return v6[:, :3], v6[:, 3:]


# ---------------------------------------------------------------------------
# Full substep
# ---------------------------------------------------------------------------

def physics_substep(ps: PhysicsState, params: PhysicsParams, dt: float) -> PhysicsState:
    """Advance all bodies by one fixed timestep `dt` (the 1/60 s tick of
    `Scene.cpp:720-729`)."""
    if ps.has_proxies:
        # sub-collider proxies track their compound root: same pose and velocity,
        # geometry offset comes from `offset` inside narrowphase/world_aabbs
        root = jnp.where(ps.parent >= 0, ps.parent, jnp.arange(ps.num_slots, dtype=jnp.int32))
        ps = dataclasses.replace(
            ps,
            pos=ps.pos[root], quat=ps.quat[root],
            linvel=ps.linvel[root], angvel=ps.angvel[root],
            prev_pos=ps.prev_pos[root], prev_quat=ps.prev_quat[root],
        )

    dyn = (ps.body_type == BODY_DYNAMIC) & ps.active
    # sleeping bodies are frozen this substep: no gravity, infinite mass in
    # contacts, no integration (Jolt island deactivation, per-body form)
    awake = ~ps.asleep
    dyn_awake = dyn & awake
    dynf = dyn_awake.astype(jnp.float32)[:, None]

    # roll previous pose (reference keeps previous_translation/rotation for interpolation)
    prev_pos, prev_quat = ps.pos, ps.quat

    # integrate forces: gravity + drag (Jolt damping: v *= max(0, 1 - c*dt));
    # dynamic bodies only — kinematic bodies keep their driven velocity
    lv = ps.linvel + params.gravity[None, :] * (ps.gravity_factor[:, None] * dt) * dynf
    drag_l = jnp.where(dyn[:, None], jnp.maximum(0.0, 1.0 - ps.linear_drag[:, None] * dt), 1.0)
    drag_a = jnp.where(dyn[:, None], jnp.maximum(0.0, 1.0 - ps.angular_drag[:, None] * dt), 1.0)
    lv = lv * drag_l
    av = ps.angvel * drag_a
    lv = jnp.where(dyn[:, None], lv * ps.dof_mask_lin, lv)
    av = jnp.where(dyn[:, None], av * ps.dof_mask_ang, av)
    static = (ps.body_type == BODY_STATIC) | ~ps.active
    lv = jnp.where(static[:, None], 0.0, lv)
    av = jnp.where(static[:, None], 0.0, av)
    ps = dataclasses.replace(ps, linvel=lv, angvel=av)

    # collide
    ia, ib, pair_valid = broadphase_pairs(ps, params, dt)
    normal, point, depth, valid, c_ia, c_ib, _ = narrowphase(ps, params, ia, ib, pair_valid)
    if ps.mesh_tri is not None:
        # static mesh-collider contacts join the same stream (the mesh body slot
        # is static, so the solver treats them like any body-vs-static contact)
        mn, mp, md, mv, mia, mib = mesh_contacts(ps, params)
        normal = jnp.concatenate([normal, mn])
        point = jnp.concatenate([point, mp])
        depth = jnp.concatenate([depth, md])
        valid = jnp.concatenate([valid, mv])
        c_ia = jnp.concatenate([c_ia, mia])
        c_ib = jnp.concatenate([c_ib, mib])

    # grounding info (character controllers): per-body max support-normal y.
    # normal points a→b, so body b's support normal is +n, body a's is -n.
    b_slots = ps.num_slots
    touching = valid & (depth > -params.penetration_slop)
    c_ia_g, c_ib_g = c_ia, c_ib
    if ps.has_proxies:  # grounding info aggregates onto compound roots
        root = jnp.where(ps.parent >= 0, ps.parent, jnp.arange(b_slots, dtype=jnp.int32))
        c_ia_g, c_ib_g = root[c_ia], root[c_ib]
    ia_safe = jnp.where(touching, c_ia_g, b_slots)
    ib_safe = jnp.where(touching, c_ib_g, b_slots)
    ny = normal[:, 1]
    gy = jnp.full((b_slots,), -1.0, jnp.float32)
    gy = gy.at[ib_safe].max(jnp.where(touching, ny, -1.0), mode="drop")
    gy = gy.at[ia_safe].max(jnp.where(touching, -ny, -1.0), mode="drop")
    ps = dataclasses.replace(ps, ground_normal_y=gy)

    # solve (sleeping bodies participate as infinite-mass obstacles)
    ps_solve = ps
    if params.allow_sleeping:
        ps_solve = dataclasses.replace(
            ps,
            inv_mass=jnp.where(awake, ps.inv_mass, 0.0),
            inv_inertia=jnp.where(awake[:, None], ps.inv_inertia, 0.0),
        )
    lv, av = solve_velocity(ps_solve, params, dt, normal, point, depth, valid, c_ia, c_ib)
    movable = dyn_awake
    lv = jnp.where(movable[:, None], lv, ps.linvel)
    av = jnp.where(movable[:, None], av, ps.angvel)

    # integrate positions (kinematic bodies also move by their velocity, like Jolt)
    kin_or_dyn = ps.active & (ps.body_type != BODY_STATIC) & awake
    new_pos = jnp.where(kin_or_dyn[:, None], ps.pos + lv * dt, ps.pos)
    new_quat = jnp.where(
        kin_or_dyn[:, None], math3d.quat_integrate(ps.quat, av, dt), ps.quat
    )

    # gyroscopic term (Jolt Body::SetApplyGyroscopicForce, off by default like
    # BodyCreationSettings): instead of Jolt's explicit -ω×Iω force we conserve
    # angular momentum exactly through the rotation update — L = I_w(q)·ω stays
    # fixed across the torque-free substep, so ω' = I_w(q')⁻¹·L. This produces
    # correct torque-free precession and intermediate-axis tumbling and cannot
    # inject energy (tests/test_physics_rotation.py).
    gyro = ps.apply_gyro & dyn_awake & jnp.all(ps.inv_inertia > 0.0, axis=-1)
    r_old = math3d.quat_to_mat3(ps.quat)
    inertia_body = 1.0 / jnp.maximum(ps.inv_inertia, 1e-12)
    l_world = jnp.einsum(
        "bij,bj->bi", r_old, inertia_body * jnp.einsum("bji,bj->bi", r_old, av)
    )

    def _omega_from_l(q):
        r = math3d.quat_to_mat3(q)
        return jnp.einsum(
            "bij,bj->bi", r, ps.inv_inertia * jnp.einsum("bji,bj->bi", r, l_world)
        )

    # midpoint pass: rotate by the average of start/end ω (one fixed-point
    # iteration of the implicit midpoint rule) — the plain end-point update
    # conserves L but drifts rotational energy ~1.5%/s on fast tumbles
    av_end = _omega_from_l(new_quat)
    q_mid = math3d.quat_integrate(ps.quat, 0.5 * (av + av_end), dt)
    av_gyro = _omega_from_l(q_mid)
    new_quat = jnp.where(gyro[:, None], q_mid, new_quat)
    av = jnp.where(gyro[:, None], av_gyro, av)

    # ---- sleeping bookkeeping (Jolt PhysicsSettings thresholds) --------------
    asleep, sleep_timer = ps.asleep, ps.sleep_timer
    if params.allow_sleeping:
        # wake propagation through the contact graph: a touching pair whose other
        # side is an awake dynamic body wakes this one (islands wake as a unit)
        # characteristic-point speed: |v| + r·|ω| below threshold for sleep_time
        r_eff = jnp.maximum(jnp.max(ps.half_extent, axis=1), ps.radius + ps.half_length)
        speed2 = jnp.sum(lv * lv, axis=-1) + r_eff * r_eff * jnp.sum(av * av, axis=-1)
        moving = speed2 >= params.sleep_velocity**2

        # wake propagation through the contact graph: only an awake MOVING dynamic
        # partner wakes a body (an awake-at-rest partner must not — otherwise two
        # resting bodies keep each other awake forever and nothing ever sleeps)
        pusher = dyn_awake & moving
        other_a = jnp.where(touching, pusher[c_ia_g], False)
        other_b = jnp.where(touching, pusher[c_ib_g], False)
        wake = jnp.zeros((b_slots,), jnp.bool_)
        wake = wake.at[ib_safe].max(other_a, mode="drop")
        wake = wake.at[ia_safe].max(other_b, mode="drop")

        eligible = ~moving & dyn & ~ps.is_character
        sleep_timer = jnp.where(eligible & ~wake, ps.sleep_timer + dt, 0.0)
        fall_asleep = eligible & ~wake & (sleep_timer >= params.sleep_time)
        asleep = (ps.asleep & ~wake) | fall_asleep
        # deactivated bodies carry exactly zero velocity (Jolt zeroes on sleep)
        lv = jnp.where(asleep[:, None], 0.0, lv)
        av = jnp.where(asleep[:, None], 0.0, av)

    return dataclasses.replace(
        ps,
        pos=new_pos,
        quat=new_quat,
        linvel=lv,
        angvel=av,
        prev_pos=prev_pos,
        prev_quat=prev_quat,
        asleep=asleep,
        sleep_timer=sleep_timer,
    )
