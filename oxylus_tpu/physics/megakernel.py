"""Physics mega-kernel: the whole fixed substep as ONE Pallas kernel.

Motivation (PERF_NOTES.md): on the target, every non-fused XLA op costs ~100-300µs, so
the multi-kernel substep pays a fixed ~10ms tax regardless of body count. This kernel
runs broadphase + narrowphase + the projected-Jacobi solver + integration entirely
on-chip with body state resident in VMEM — one launch per frame step.

Design:
- Bodies stored as (B,) component arrays (B = 1024 default → (8, 128) VMEM tiles).
- Pair space processed densely in (CHUNK, B) row-blocks: broadphase mask, analytic
  contacts (capsule-capsule via segment distance; box-capsule via 1-sample closest
  feature; box-box via face-axis SAT + deepest-corner manifold point) — all fused
  VPU arithmetic, no gathers, no scatters, no compaction.
- Solver: mass-splitting projected Jacobi, `iterations` sweeps. Stateless per sweep
  (no accumulated impulse clamping): λ_n = max(0, -(vn - bias)/k) each sweep — the
  parallel-friendly projection; friction clamped by µ·λ_n of the same sweep.
  This matches the XLA solver's fixed points for resting contact; restitution uses
  the current-sweep approach velocity (adequate for e≈0 workloads; the XLA path
  remains the reference implementation for bouncy trajectories).
- A simplification vs the XLA path: one contact point per pair (the deepest feature).
  Box stacks remain stable thanks to Baumgarte + locked solver order; the 4-point
  manifold version is the planned upgrade (contact cache in HBM scratch).

`megakernel_substep(ps, params, dt, n_substeps)` runs N substeps per launch and is a
drop-in alternative to `step.physics_substep` for throughput workloads (benchmarks),
selected via `PhysicsParams.comm == "mega"`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .state import BODY_DYNAMIC, BODY_STATIC, SHAPE_BOX, PhysicsParams, PhysicsState

Array = jax.Array

CHUNK = 64  # a-rows per pair block (sized to fit VMEM at B=1024)


def _kernel(
    # scalar params (SMEM)
    scalars_ref,  # (8,) f32: [dt, gx, gy, gz, baumgarte, slop, margin, n_substeps]
    # body inputs (VMEM, (B,) each)
    posx, posy, posz,
    velx, vely, velz,
    avx, avy, avz,
    qx, qy, qz, qw,
    inv_mass, im3x, im3y, im3z,  # inv inertia diagonal (body frame)
    hx, hy, hz, rad, hlen,
    fric, rest, grav, dof_x, dof_y, dof_z,
    is_box, dynamic, movable, act,
    # outputs
    o_posx, o_posy, o_posz,
    o_velx, o_vely, o_velz,
    o_avx, o_avy, o_avz,
    o_qx, o_qy, o_qz, o_qw,
    *,
    iterations: int,
    n_bodies: int,
):
    dt = scalars_ref[0]
    g = (scalars_ref[1], scalars_ref[2], scalars_ref[3])
    baumgarte = scalars_ref[4]
    slop = scalars_ref[5]
    margin = scalars_ref[6]
    n_sub = scalars_ref[7].astype(jnp.int32)

    b = n_bodies
    n_chunks = b // CHUNK

    # read constant body attributes out of their refs once
    grav_v = grav[:]; dyn_v = dynamic[:]; mov_v = movable[:]; box_v = is_box[:]
    act_v = act[:]
    hx_v = hx[:]; hy_v = hy[:]; hz_v = hz[:]
    rad_v = rad[:]; hlen_v = hlen[:]; fric_v = fric[:]
    inv_mass_v = inv_mass[:]
    im3x_v = im3x[:]; im3y_v = im3y[:]; im3z_v = im3z[:]
    dof_x_v = dof_x[:]; dof_y_v = dof_y[:]; dof_z_v = dof_z[:]

    def body_substep(_, carry):
        (px, py, pz, vx, vy, vz, wx, wy, wz, cqx, cqy, cqz, cqw) = carry

        # --- integrate velocities (gravity; dynamics only) -------------------
        vy = vy + g[1] * grav_v * dt * dyn_v
        vx = vx + g[0] * grav_v * dt * dyn_v
        vz = vz + g[2] * grav_v * dt * dyn_v

        # rotation matrix entries from quaternion (for box axes/AABB)
        xx = cqx * cqx; yy = cqy * cqy; zz = cqz * cqz
        xy = cqx * cqy; xz = cqx * cqz; yz = cqy * cqz
        wx_ = cqw * cqx; wy_ = cqw * cqy; wz_ = cqw * cqz
        r00 = 1 - 2 * (yy + zz); r01 = 2 * (xy - wz_); r02 = 2 * (xz + wy_)
        r10 = 2 * (xy + wz_);    r11 = 1 - 2 * (xx + zz); r12 = 2 * (yz - wx_)
        r20 = 2 * (xz - wy_);    r21 = 2 * (yz + wx_);    r22 = 1 - 2 * (xx + yy)

        # conservative world AABB half extents
        lhx = jnp.where(box_v > 0.5, hx_v, rad_v)
        lhy = jnp.where(box_v > 0.5, hy_v, rad_v + hlen_v)
        lhz = jnp.where(box_v > 0.5, hz_v, rad_v)
        ehx = jnp.abs(r00) * lhx + jnp.abs(r01) * lhy + jnp.abs(r02) * lhz + margin
        ehy = jnp.abs(r10) * lhx + jnp.abs(r11) * lhy + jnp.abs(r12) * lhz + margin
        ehz = jnp.abs(r20) * lhx + jnp.abs(r21) * lhy + jnp.abs(r22) * lhz + margin

        # capsule axis (local +Y rotated) scaled by half length
        cax = r01 * hlen_v
        cay = r11 * hlen_v
        caz = r21 * hlen_v

        # --- per-body contact-count estimate (AABB overlaps) for mass splitting ---
        def count_chunk(c):
            start = c * CHUNK  # static (python-level unroll)

            def row(a):  # (1, B) lanes-major -> this chunk as a (CHUNK, 1) column
                return jnp.swapaxes(a[0:1, start : start + CHUNK], 0, 1)

            def col(a):  # already (1, B)
                return a

            dxc = col(px) - row(px)
            dyc = col(py) - row(py)
            dzc = col(pz) - row(pz)
            overlap = (
                (jnp.abs(dxc) <= row(ehx) + col(ehx))
                & (jnp.abs(dyc) <= row(ehy) + col(ehy))
                & (jnp.abs(dzc) <= row(ehz) + col(ehz))
            )
            some_dyn = (row(dyn_v) + col(dyn_v)) > 0.5
            both_act = (row(act_v) * col(act_v)) > 0.5
            a_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, b), 0) + start
            b_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, b), 1)
            ov = (overlap & some_dyn & both_act & (a_ids != b_ids)).astype(jnp.float32)
            # row sums → (1, CHUNK) lane tile; col sums → (1, B)
            return (
                jnp.swapaxes(jnp.sum(ov, axis=1, keepdims=True), 0, 1),
                jnp.sum(ov, axis=0, keepdims=True),
            )

        row_counts = []
        col_count = jnp.zeros_like(px)
        for _c in range(n_chunks):
            rc, cc_ = count_chunk(_c)
            row_counts.append(rc)
            col_count = col_count + cc_
        cnt = (
            row_counts[0] if n_chunks == 1 else jnp.concatenate(row_counts, axis=1)
        ) + col_count
        split = jnp.maximum(cnt, 1.0)
        im_eff = inv_mass_v * split
        im3x_eff = im3x_v * split
        im3y_eff = im3y_v * split
        im3z_eff = im3z_v * split

        def solve_iter(_, vcarry):
            vx, vy, vz, wx, wy, wz = vcarry

            def chunk_body(c):
                start = c * CHUNK  # static (python-level unroll)
                # per-chunk accumulators: row-side (1, CHUNK) and col-side (1, B)
                racc = [jnp.zeros((1, CHUNK), jnp.float32) for _ in range(6)]
                cacc = [jnp.zeros((1, b), jnp.float32) for _ in range(6)]

                def row(a):  # (1, B) lanes-major -> this chunk as a (CHUNK, 1) column
                    return jnp.swapaxes(a[0:1, start : start + CHUNK], 0, 1)

                def col(a):  # already (1, B)
                    return a

                # pair masks
                dxc = col(px) - row(px)
                dyc = col(py) - row(py)
                dzc = col(pz) - row(pz)
                overlap = (
                    (jnp.abs(dxc) <= row(ehx) + col(ehx))
                    & (jnp.abs(dyc) <= row(ehy) + col(ehy))
                    & (jnp.abs(dzc) <= row(ehz) + col(ehz))
                )
                some_dyn = (row(dyn_v) + col(dyn_v)) > 0.5
                both_act = (row(act_v) * col(act_v)) > 0.5
                a_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, b), 0) + start
                b_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, b), 1)
                not_self = a_ids != b_ids
                active = overlap & some_dyn & both_act & not_self

                # --- contact generation (single deepest point per pair) ------
                both_round = (row(box_v) < 0.5) & (col(box_v) < 0.5)
                a_box = row(box_v) > 0.5
                b_box = col(box_v) > 0.5

                # (1) capsule-capsule: closest points on segments (approximate:
                # clamp b's parameter first, then a's — exact for spheres)
                relx = dxc; rely = dyc; relz = dzc
                adx = row(cax); ady = row(cay); adz = row(caz)
                bdx = col(cax); bdy = col(cay); bdz = col(caz)
                # t_b = clamp(dot(rel, bdir)/|bd|^2) with bd scaled segment
                bd2 = bdx * bdx + bdy * bdy + bdz * bdz + 1e-9
                tb = jnp.clip(-(relx * bdx + rely * bdy + relz * bdz) / bd2, -1.0, 1.0)
                bxp = -relx + tb * bdx  # b point relative to a center
                byp = -rely + tb * bdy
                bzp = -relz + tb * bdz
                ad2 = adx * adx + ady * ady + adz * adz + 1e-9
                ta = jnp.clip((bxp * adx + byp * ady + bzp * adz) / ad2, -1.0, 1.0)
                sxp = bxp - ta * adx
                syp = byp - ta * ady
                szp = bzp - ta * adz
                dist_cc = jnp.sqrt(sxp * sxp + syp * syp + szp * szp) + 1e-9
                ncc_x = -sxp / dist_cc  # normal a→b
                ncc_y = -syp / dist_cc
                ncc_z = -szp / dist_cc
                depth_cc = row(rad_v) + col(rad_v) - dist_cc
                # contact point (world, relative to a center): surface midpoint
                pcc_x = ta * adx + ncc_x * (row(rad_v) + depth_cc * 0.5)
                pcc_y = ta * ady + ncc_y * (row(rad_v) + depth_cc * 0.5)
                pcc_z = ta * adz + ncc_z * (row(rad_v) + depth_cc * 0.5)

                # (2) box(a) - capsule/sphere(b): closest feature in a's frame
                # b center in a frame
                lax_ = row(r00) * dxc + row(r10) * dyc + row(r20) * dzc
                lay = row(r01) * dxc + row(r11) * dyc + row(r21) * dzc
                laz = row(r02) * dxc + row(r12) * dyc + row(r22) * dzc
                clx = jnp.clip(lax_, -row(hx_v), row(hx_v))
                cly = jnp.clip(lay, -row(hy_v), row(hy_v))
                clz = jnp.clip(laz, -row(hz_v), row(hz_v))
                ddx = lax_ - clx; ddy = lay - cly; ddz = laz - clz
                out_d = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                outside = out_d > 1e-6
                # inside: push along min-penetration face
                fdx = row(hx_v) - jnp.abs(lax_)
                fdy = row(hy_v) - jnp.abs(lay)
                fdz = row(hz_v) - jnp.abs(laz)
                fmin = jnp.minimum(fdx, jnp.minimum(fdy, fdz))
                nin_x = jnp.where(fdx <= fmin + 1e-9, jnp.sign(lax_), 0.0)
                nin_y = jnp.where((fdy <= fmin + 1e-9) & (fdx > fmin + 1e-9), jnp.sign(lay), 0.0)
                nin_z = jnp.where(
                    (fdz <= fmin + 1e-9) & (fdy > fmin + 1e-9) & (fdx > fmin + 1e-9),
                    jnp.sign(laz), 0.0,
                )
                nl_x = jnp.where(outside, ddx / (out_d + 1e-9), nin_x)
                nl_y = jnp.where(outside, ddy / (out_d + 1e-9), nin_y)
                nl_z = jnp.where(outside, ddz / (out_d + 1e-9), nin_z)
                sd = jnp.where(outside, -out_d, fmin)  # >0 = center inside
                depth_bc = sd + col(rad_v)
                # normal back to world (a frame → world)
                nbc_x = row(r00) * nl_x + row(r01) * nl_y + row(r02) * nl_z
                nbc_y = row(r10) * nl_x + row(r11) * nl_y + row(r12) * nl_z
                nbc_z = row(r20) * nl_x + row(r21) * nl_y + row(r22) * nl_z
                # contact at b's surface point
                pbc_x = dxc - nbc_x * col(rad_v)
                pbc_y = dyc - nbc_y * col(rad_v)
                pbc_z = dzc - nbc_z * col(rad_v)

                # (3) capsule(a) - box(b): mirror of (2) in b's frame
                lbx = col(r00) * -dxc + col(r10) * -dyc + col(r20) * -dzc
                lby = col(r01) * -dxc + col(r11) * -dyc + col(r21) * -dzc
                lbz = col(r02) * -dxc + col(r12) * -dyc + col(r22) * -dzc
                cbx = jnp.clip(lbx, -col(hx_v), col(hx_v))
                cby = jnp.clip(lby, -col(hy_v), col(hy_v))
                cbz = jnp.clip(lbz, -col(hz_v), col(hz_v))
                edx = lbx - cbx; edy = lby - cby; edz = lbz - cbz
                eod = jnp.sqrt(edx * edx + edy * edy + edz * edz)
                eoutside = eod > 1e-6
                gdx = col(hx_v) - jnp.abs(lbx)
                gdy = col(hy_v) - jnp.abs(lby)
                gdz = col(hz_v) - jnp.abs(lbz)
                gmin = jnp.minimum(gdx, jnp.minimum(gdy, gdz))
                min_x = jnp.where(gdx <= gmin + 1e-9, jnp.sign(lbx), 0.0)
                min_y = jnp.where((gdy <= gmin + 1e-9) & (gdx > gmin + 1e-9), jnp.sign(lby), 0.0)
                min_z = jnp.where(
                    (gdz <= gmin + 1e-9) & (gdy > gmin + 1e-9) & (gdx > gmin + 1e-9),
                    jnp.sign(lbz), 0.0,
                )
                ml_x = jnp.where(eoutside, edx / (eod + 1e-9), min_x)
                ml_y = jnp.where(eoutside, edy / (eod + 1e-9), min_y)
                ml_z = jnp.where(eoutside, edz / (eod + 1e-9), min_z)
                esd = jnp.where(eoutside, -eod, gmin)
                depth_cb = esd + row(rad_v)
                # normal: from b's face toward a, world space = b→a; flip to a→b
                ncb_x = -(col(r00) * ml_x + col(r01) * ml_y + col(r02) * ml_z)
                ncb_y = -(col(r10) * ml_x + col(r11) * ml_y + col(r12) * ml_z)
                ncb_z = -(col(r20) * ml_x + col(r21) * ml_y + col(r22) * ml_z)
                pcb_x = ncb_x * row(rad_v)  # a's surface point toward b (rel a center)
                pcb_y = ncb_y * row(rad_v)
                pcb_z = ncb_z * row(rad_v)

                # (4) box-box: face-axis SAT for the normal; manifold = the 4
                # corners of the incident box's face (the face most anti-parallel to
                # the normal), tested against the reference box's support plane with
                # a lateral-inclusion guard — the dense-form equivalent of the XLA
                # path's corner manifold (physics/step.py::_contact_box_box).
                def proj_pair(ax, ay, az):
                    pa = (
                        jnp.abs(ax * row(r00) + ay * row(r10) + az * row(r20)) * row(hx_v)
                        + jnp.abs(ax * row(r01) + ay * row(r11) + az * row(r21)) * row(hy_v)
                        + jnp.abs(ax * row(r02) + ay * row(r12) + az * row(r22)) * row(hz_v)
                    )
                    pb = (
                        jnp.abs(ax * col(r00) + ay * col(r10) + az * col(r20)) * col(hx_v)
                        + jnp.abs(ax * col(r01) + ay * col(r11) + az * col(r21)) * col(hy_v)
                        + jnp.abs(ax * col(r02) + ay * col(r12) + az * col(r22)) * col(hz_v)
                    )
                    dist = jnp.abs(ax * dxc + ay * dyc + az * dzc)
                    return pa + pb - dist

                best_depth = jnp.full((CHUNK, b), 1e30)
                nbb_x = jnp.zeros((CHUNK, b)); nbb_y = jnp.zeros((CHUNK, b)); nbb_z = jnp.zeros((CHUNK, b))
                ref_is_a = jnp.ones((CHUNK, b), jnp.float32)
                axes = [
                    (row(r00), row(r10), row(r20), 1.0),
                    (row(r01), row(r11), row(r21), 1.0),
                    (row(r02), row(r12), row(r22), 1.0),
                    (col(r00), col(r10), col(r20), 0.0),
                    (col(r01), col(r11), col(r21), 0.0),
                    (col(r02), col(r12), col(r22), 0.0),
                ]
                for ax, ay, az, from_a in axes:
                    ov = proj_pair(ax, ay, az)
                    better = ov < best_depth
                    best_depth = jnp.where(better, ov, best_depth)
                    one = jnp.ones_like(ov)
                    nbb_x = jnp.where(better, ax * one, nbb_x)
                    nbb_y = jnp.where(better, ay * one, nbb_y)
                    nbb_z = jnp.where(better, az * one, nbb_z)
                    ref_is_a = jnp.where(better, from_a * one, ref_is_a)
                # orient a→b
                sgn = jnp.sign(nbb_x * dxc + nbb_y * dyc + nbb_z * dzc + 1e-12)
                nbb_x = nbb_x * sgn; nbb_y = nbb_y * sgn; nbb_z = nbb_z * sgn
                depth_bb = best_depth

                # incident body: b when the reference face is a's, else a.
                # its face axes in world space:
                def body_axes(use_row):
                    if use_row:
                        return (
                            (row(r00), row(r10), row(r20), row(hx_v)),
                            (row(r01), row(r11), row(r21), row(hy_v)),
                            (row(r02), row(r12), row(r22), row(hz_v)),
                        )
                    return (
                        (col(r00), col(r10), col(r20), col(hx_v)),
                        (col(r01), col(r11), col(r21), col(hy_v)),
                        (col(r02), col(r12), col(r22), col(hz_v)),
                    )

                a_axes = body_axes(True)
                b_axes = body_axes(False)

                def incident_face(axes3, toward_n_sign):
                    """Face of the body most anti-parallel to n (or parallel for the
                    a-side). Returns (face offset vec, edge vec u, edge vec v)."""
                    dots = [axk[0] * nbb_x + axk[1] * nbb_y + axk[2] * nbb_z for axk in axes3]
                    absd = [jnp.abs(d) for d in dots]
                    k0 = (absd[0] >= absd[1]) & (absd[0] >= absd[2])
                    k1 = (~k0) & (absd[1] >= absd[2])
                    k2 = (~k0) & (~k1)
                    masks = [k0.astype(jnp.float32), k1.astype(jnp.float32), k2.astype(jnp.float32)]
                    fx = fy = fz = 0.0
                    ux = uy = uz = 0.0
                    vx_ = vy_ = vz_ = 0.0
                    for k in range(3):
                        m = masks[k]
                        sgn_k = -jnp.sign(dots[k] + 1e-12) * toward_n_sign
                        akx, aky, akz, hk = axes3[k]
                        fx = fx + m * sgn_k * akx * hk
                        fy = fy + m * sgn_k * aky * hk
                        fz = fz + m * sgn_k * akz * hk
                        iux, iuy, iuz, hu = axes3[(k + 1) % 3]
                        ivx, ivy, ivz, hv = axes3[(k + 2) % 3]
                        ux = ux + m * iux * hu
                        uy = uy + m * iuy * hu
                        uz = uz + m * iuz * hu
                        vx_ = vx_ + m * ivx * hv
                        vy_ = vy_ + m * ivy * hv
                        vz_ = vz_ + m * ivz * hv
                    return (fx, fy, fz), (ux, uy, uz), (vx_, vy_, vz_)

                # incident = b (face toward -n) when ref==a; incident = a (face
                # toward +n) when ref==b
                fb, ub, vb_ = incident_face(b_axes, 1.0)
                fa, ua, va_ = incident_face(a_axes, -1.0)
                ra_mask = ref_is_a

                # support radii along the contact normal
                pa_n = (
                    jnp.abs(nbb_x * row(r00) + nbb_y * row(r10) + nbb_z * row(r20)) * row(hx_v)
                    + jnp.abs(nbb_x * row(r01) + nbb_y * row(r11) + nbb_z * row(r21)) * row(hy_v)
                    + jnp.abs(nbb_x * row(r02) + nbb_y * row(r12) + nbb_z * row(r22)) * row(hz_v)
                )
                pb_n = (
                    jnp.abs(nbb_x * col(r00) + nbb_y * col(r10) + nbb_z * col(r20)) * col(hx_v)
                    + jnp.abs(nbb_x * col(r01) + nbb_y * col(r11) + nbb_z * col(r21)) * col(hy_v)
                    + jnp.abs(nbb_x * col(r02) + nbb_y * col(r12) + nbb_z * col(r22)) * col(hz_v)
                )

                # build the 4 manifold corners (rel. a center) + per-corner depth
                bb_pts = []
                for su, sv in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
                    # incident-from-b corner; clamp into a's footprint (the
                    # Sutherland-Hodgman-style trim of the manifold, done per corner:
                    # depth measured from the ORIGINAL corner, position from the
                    # clamped one — also handles a huge incident face cleanly)
                    cbx_ = dxc + fb[0] + su * ub[0] + sv * vb_[0]
                    cby_ = dyc + fb[1] + su * ub[1] + sv * vb_[1]
                    cbz_ = dzc + fb[2] + su * ub[2] + sv * vb_[2]
                    dep_b = pa_n - (cbx_ * nbb_x + cby_ * nbb_y + cbz_ * nbb_z)
                    lxa = jnp.clip(row(r00) * cbx_ + row(r10) * cby_ + row(r20) * cbz_, -row(hx_v), row(hx_v))
                    lya = jnp.clip(row(r01) * cbx_ + row(r11) * cby_ + row(r21) * cbz_, -row(hy_v), row(hy_v))
                    lza = jnp.clip(row(r02) * cbx_ + row(r12) * cby_ + row(r22) * cbz_, -row(hz_v), row(hz_v))
                    cbx_c = row(r00) * lxa + row(r01) * lya + row(r02) * lza
                    cby_c = row(r10) * lxa + row(r11) * lya + row(r12) * lza
                    cbz_c = row(r20) * lxa + row(r21) * lya + row(r22) * lza
                    # incident-from-a corner; clamp into b's footprint
                    cax_ = fa[0] + su * ua[0] + sv * va_[0]
                    cay_ = fa[1] + su * ua[1] + sv * va_[1]
                    caz_ = fa[2] + su * ua[2] + sv * va_[2]
                    dep_a = pb_n + ((cax_ - dxc) * nbb_x + (cay_ - dyc) * nbb_y + (caz_ - dzc) * nbb_z)
                    lxb = jnp.clip(col(r00) * (cax_ - dxc) + col(r10) * (cay_ - dyc) + col(r20) * (caz_ - dzc), -col(hx_v), col(hx_v))
                    lyb = jnp.clip(col(r01) * (cax_ - dxc) + col(r11) * (cay_ - dyc) + col(r21) * (caz_ - dzc), -col(hy_v), col(hy_v))
                    lzb = jnp.clip(col(r02) * (cax_ - dxc) + col(r12) * (cay_ - dyc) + col(r22) * (caz_ - dzc), -col(hz_v), col(hz_v))
                    cax_c = dxc + col(r00) * lxb + col(r01) * lyb + col(r02) * lzb
                    cay_c = dyc + col(r10) * lxb + col(r11) * lyb + col(r12) * lzb
                    caz_c = dzc + col(r20) * lxb + col(r21) * lyb + col(r22) * lzb
                    px_k = jnp.where(ra_mask > 0.5, cbx_c, cax_c)
                    py_k = jnp.where(ra_mask > 0.5, cby_c, cay_c)
                    pz_k = jnp.where(ra_mask > 0.5, cbz_c, caz_c)
                    dep_k = jnp.where(ra_mask > 0.5, dep_b, dep_a)
                    dep_k = jnp.where(depth_bb > 0.0, dep_k, -1e9)
                    bb_pts.append((px_k, py_k, pz_k, dep_k))

                # --- select per pair kind: 4 contact slots -------------------
                def sel(cc, bc, cb2, bb):
                    out = jnp.where(both_round, cc, bb)
                    out = jnp.where(a_box & ~b_box, bc, out)
                    out = jnp.where(~a_box & b_box, cb2, out)
                    return out

                nx = sel(ncc_x, nbc_x, ncb_x, nbb_x)
                ny = sel(ncc_y, nbc_y, ncb_y, nbb_y)
                nz = sel(ncc_z, nbc_z, ncb_z, nbb_z)
                is_bb = a_box & b_box
                neg = jnp.full_like(depth_cc, -1e9)
                slots = [
                    (
                        sel(pcc_x, pbc_x, pcb_x, bb_pts[0][0]),
                        sel(pcc_y, pbc_y, pcb_y, bb_pts[0][1]),
                        sel(pcc_z, pbc_z, pcb_z, bb_pts[0][2]),
                        sel(depth_cc, depth_bc, depth_cb, bb_pts[0][3]),
                    )
                ]
                for k in range(1, 4):
                    slots.append(
                        (
                            bb_pts[k][0],
                            bb_pts[k][1],
                            bb_pts[k][2],
                            jnp.where(is_bb, bb_pts[k][3], neg),
                        )
                    )

                mu = jnp.sqrt(row(fric_v) * col(fric_v))

                # --- per-point impulses (stateless projected Jacobi) ---------
                for rpx, rpy, rpz, depth in slots:
                    touching = active & (depth > 0.0)
                    tf = touching.astype(jnp.float32)

                    rax = rpx; ray = rpy; raz = rpz
                    rbx = rpx - dxc; rby = rpy - dyc; rbz = rpz - dzc

                    rvx = col(vx) + col(wy) * rbz - col(wz) * rby - (row(vx) + row(wy) * raz - row(wz) * ray)
                    rvy = col(vy) + col(wz) * rbx - col(wx) * rbz - (row(vy) + row(wz) * rax - row(wx) * raz)
                    rvz = col(vz) + col(wx) * rby - col(wy) * rbx - (row(vz) + row(wx) * ray - row(wy) * rax)
                    vn = rvx * nx + rvy * ny + rvz * nz

                    raxn_x = ray * nz - raz * ny
                    raxn_y = raz * nx - rax * nz
                    raxn_z = rax * ny - ray * nx
                    rbxn_x = rby * nz - rbz * ny
                    rbxn_y = rbz * nx - rbx * nz
                    rbxn_z = rbx * ny - rby * nx
                    ang_a = row(im3x_eff) * raxn_x**2 + row(im3y_eff) * raxn_y**2 + row(im3z_eff) * raxn_z**2
                    ang_b = col(im3x_eff) * rbxn_x**2 + col(im3y_eff) * rbxn_y**2 + col(im3z_eff) * rbxn_z**2
                    kn = row(im_eff) + col(im_eff) + ang_a + ang_b + 1e-9

                    bias = baumgarte / dt * jnp.maximum(depth - slop, 0.0)
                    lam = jnp.maximum(-(vn - bias) / kn, 0.0) * tf

                    tvx = rvx - vn * nx
                    tvy = rvy - vn * ny
                    tvz = rvz - vn * nz
                    tvl = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz) + 1e-9
                    lam_t = jnp.minimum(tvl / kn, mu * lam) * tf
                    jx = nx * lam - tvx / tvl * lam_t
                    jy = ny * lam - tvy / tvl * lam_t
                    jz = nz * lam - tvz / tvl * lam_t

                    rT = lambda m: jnp.swapaxes(jnp.sum(m, axis=1, keepdims=True), 0, 1)
                    cS = lambda m: jnp.sum(m, axis=0, keepdims=True)
                    racc[0] = racc[0] - rT(jx)
                    racc[1] = racc[1] - rT(jy)
                    racc[2] = racc[2] - rT(jz)
                    cacc[0] = cacc[0] + cS(jx)
                    cacc[1] = cacc[1] + cS(jy)
                    cacc[2] = cacc[2] + cS(jz)
                    tq_ax = ray * jz - raz * jy
                    tq_ay = raz * jx - rax * jz
                    tq_az = rax * jy - ray * jx
                    tq_bx = rby * jz - rbz * jy
                    tq_by = rbz * jx - rbx * jz
                    tq_bz = rbx * jy - rby * jx
                    racc[3] = racc[3] - rT(tq_ax)
                    racc[4] = racc[4] - rT(tq_ay)
                    racc[5] = racc[5] - rT(tq_az)
                    cacc[3] = cacc[3] + cS(tq_bx)
                    cacc[4] = cacc[4] + cS(tq_by)
                    cacc[5] = cacc[5] + cS(tq_bz)
                return racc, cacc
                return accx, accy, accz, tqx, tqy, tqz

            row_parts = []
            col_parts = [jnp.zeros((1, b), jnp.float32) for _ in range(6)]
            for _c in range(n_chunks):
                racc, cacc = chunk_body(_c)
                row_parts.append(racc)
                col_parts = [col_parts[i] + cacc[i] for i in range(6)]
            if n_chunks == 1:
                totals = [row_parts[0][i] + col_parts[i] for i in range(6)]
            else:
                totals = [
                    jnp.concatenate([rp[i] for rp in row_parts], axis=1) + col_parts[i]
                    for i in range(6)
                ]
            accx, accy, accz, tqx, tqy, tqz = totals
            # apply with the raw masses (mass splitting puts the count into kn)
            vx = vx + accx * inv_mass_v * dof_x_v * mov_v
            vy = vy + accy * inv_mass_v * dof_y_v * mov_v
            vz = vz + accz * inv_mass_v * dof_z_v * mov_v
            wx = wx + tqx * im3x_v * mov_v
            wy = wy + tqy * im3y_v * mov_v
            wz = wz + tqz * im3z_v * mov_v
            return vx, vy, vz, wx, wy, wz

        vx, vy, vz, wx, wy, wz = jax.lax.fori_loop(
            0, iterations, solve_iter, (vx, vy, vz, wx, wy, wz)
        )

        # --- integrate positions --------------------------------------------
        px = px + vx * dt * mov_v
        py = py + vy * dt * mov_v
        pz = pz + vz * dt * mov_v
        # quaternion integration (first order, renormalized)
        hq = 0.5 * dt
        dqx = hq * (wx * cqw + wy * cqz - wz * cqy)
        dqy = hq * (-wx * cqz + wy * cqw + wz * cqx)
        dqz = hq * (wx * cqy - wy * cqx + wz * cqw)
        dqw = hq * (-wx * cqx - wy * cqy - wz * cqz)
        nqx = cqx + dqx * mov_v
        nqy = cqy + dqy * mov_v
        nqz = cqz + dqz * mov_v
        nqw = cqw + dqw * mov_v
        qn = jax.lax.rsqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw + 1e-12)
        return (px, py, pz, vx, vy, vz, wx, wy, wz, nqx * qn, nqy * qn, nqz * qn, nqw * qn)

    init = (
        posx[:], posy[:], posz[:],
        velx[:], vely[:], velz[:],
        avx[:], avy[:], avz[:],
        qx[:], qy[:], qz[:], qw[:],
    )
    out = jax.lax.fori_loop(0, n_sub, body_substep, init)
    o_posx[:] = out[0]; o_posy[:] = out[1]; o_posz[:] = out[2]
    o_velx[:] = out[3]; o_vely[:] = out[4]; o_velz[:] = out[5]
    o_avx[:] = out[6]; o_avy[:] = out[7]; o_avz[:] = out[8]
    o_qx[:] = out[9]; o_qy[:] = out[10]; o_qz[:] = out[11]; o_qw[:] = out[12]


@partial(jax.jit, static_argnames=("iterations", "n_substeps", "interpret"))
def megakernel_substeps(
    ps: PhysicsState,
    params: PhysicsParams,
    dt,
    n_substeps: int = 1,
    iterations: int = 10,
    interpret: bool = False,
) -> PhysicsState:
    """Run `n_substeps` fixed steps in ONE kernel launch. Single-world; vmap for
    batches (each world becomes its own kernel launch under vmap — grid batching is
    the planned follow-up)."""
    b = ps.num_slots
    assert b % CHUNK == 0, "body capacity must be a multiple of 128"
    assert not ps.has_proxies, (
        "compound bodies are not supported on the mega-kernel throughput path yet; "
        "use the XLA physics_substep path"
    )

    dyn = ((ps.body_type == BODY_DYNAMIC) & ps.active).astype(jnp.float32)
    movable = ((ps.body_type != BODY_STATIC) & ps.active).astype(jnp.float32)
    is_box = (ps.shape_type == SHAPE_BOX).astype(jnp.float32)

    scalars = jnp.stack(
        [
            jnp.asarray(dt, jnp.float32),
            params.gravity[0],
            params.gravity[1],
            params.gravity[2],
            params.baumgarte,
            params.penetration_slop,
            jnp.asarray(0.04, jnp.float32),
            jnp.asarray(float(n_substeps), jnp.float32),
        ]
    )

    r1 = lambda x: x.reshape(1, b)  # lanes-major layout for Mosaic-friendly tiling
    inputs = [
        r1(ps.pos[:, 0]), r1(ps.pos[:, 1]), r1(ps.pos[:, 2]),
        r1(ps.linvel[:, 0]), r1(ps.linvel[:, 1]), r1(ps.linvel[:, 2]),
        r1(ps.angvel[:, 0]), r1(ps.angvel[:, 1]), r1(ps.angvel[:, 2]),
        r1(ps.quat[:, 0]), r1(ps.quat[:, 1]), r1(ps.quat[:, 2]), r1(ps.quat[:, 3]),
        r1(ps.inv_mass),
        r1(ps.inv_inertia[:, 0]), r1(ps.inv_inertia[:, 1]), r1(ps.inv_inertia[:, 2]),
        r1(ps.half_extent[:, 0]), r1(ps.half_extent[:, 1]), r1(ps.half_extent[:, 2]),
        r1(ps.radius), r1(ps.half_length),
        r1(ps.friction), r1(ps.restitution), r1(ps.gravity_factor),
        r1(ps.dof_mask_lin[:, 0]), r1(ps.dof_mask_lin[:, 1]), r1(ps.dof_mask_lin[:, 2]),
        r1(is_box), r1(dyn), r1(movable), r1(ps.active.astype(jnp.float32)),
    ]

    out_shapes = [jax.ShapeDtypeStruct((1, b), jnp.float32)] * 13
    outs = pl.pallas_call(
        partial(_kernel, iterations=iterations, n_bodies=b),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,  # big dense pair blocks; default 16M
        ),
        interpret=interpret,
    )(scalars, *inputs)

    (npx, npy, npz, nvx, nvy, nvz, nwx, nwy, nwz, nqx, nqy, nqz, nqw) = [
        o.reshape(b) for o in outs
    ]
    return dataclasses.replace(
        ps,
        prev_pos=ps.pos,
        prev_quat=ps.quat,
        pos=jnp.stack([npx, npy, npz], axis=-1),
        linvel=jnp.stack([nvx, nvy, nvz], axis=-1),
        angvel=jnp.stack([nwx, nwy, nwz], axis=-1),
        quat=jnp.stack([nqx, nqy, nqz, nqw], axis=-1),
    )
