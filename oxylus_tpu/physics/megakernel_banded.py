"""Banded + geometry-hoisted physics mega-kernel (throughput path, round-1 perf).

Extends `megakernel.py` (whole substep as one Pallas launch) with the two levers from
PERF_NOTES.md:

1. **Pair banding**: bodies are pre-sorted by an x-slab-major rank (one `lax.sort`
   + gathers inside the same jit, amortized over the launch's substeps). Each
   128-row chunk of bodies then only forms pairs against a 256-lane slab of ranks
   `[chunk_start, chunk_start + 256)` with a hard `1 <= rank_b - rank_a <= 128`
   mask — each unordered pair is processed once, and the sweep applies -j to the
   row side and +j to the col side (symmetry without mirrored lanes). Slab
   offsets are multiples of 128 so all VMEM slices stay lane-aligned.

2. **Geometry hoisting**: per substep, contact geometry (normal, manifold points,
   Baumgarte bias, touching mask, friction, effective-mass inverse) is computed ONCE
   per chunk into VMEM scratch; the `iterations` projected-Jacobi sweeps then run
   only the impulse math against the cached geometry. In the dense kernel the full
   SAT + manifold build was re-run inside every sweep.

Mosaic layout note: slab slices of *values* cannot be sublane-broadcast ("Invalid
input layout" on `vector.broadcast (1,S) -> (C,S)`), so every array that gets
row/col-sliced lives in a VMEM scratch ref — ref loads produce canonical layouts.
The substep state (pos/vel/quat) is therefore carried in refs, not fori carries.

Approximation contract: banding assumes lateral (x, z) coherence across one launch —
pairs whose Morton ranks drift more than ±128 apart are not re-detected until the
next launch re-sorts. For vertical-gravity scenes (the Jolt-style falling/stacking
workloads this engine targets, reference `Oxylus/vendor/Jolt` broad phase) this holds
for typical `n_substeps <= 60` launches. `tests/test_megakernel_banded.py` checks the
banded path against the dense kernel on such a scene.

Contact model, solver math, and parameter semantics are identical to
`megakernel._kernel` (mass-splitting projected Jacobi, Jolt combine rules).
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

BCHUNK = 128          # rows per pair block (sublane-aligned chunks of ranks)
BAND = 128            # max rank_b - rank_a for a pair to be considered
SLAB = BCHUNK + BAND  # 256 columns per chunk, 128-aligned slab offsets
# Single-ordering pair space: each unordered pair {a, b} (0 < rank_b - rank_a
# ≤ BAND) lives only at (row = a, col = b); the sweep applies -j to the row side
# and +j to the col side, so symmetry needs no mirrored lane — 1/3 less pair
# work than the double-ordering 384-wide slab. Coverage is exact: row i of a
# chunk reaches col offsets i+1 … i+BAND, and the trailing chunk's clamp only
# drops offsets beyond the last rank.
# (BCHUNK=64/BAND=160 was tried for a wider band at equal pair-space cost, but
# doubling the chunk count + unaligned slab slices cost ~43% wall-clock — the
# per-chunk transposes and hoisted loads dominate. The slab sort key below keeps
# worst-case pair rank distance ≈ slab population (~136 on the flagship pile),
# so the 128 band misses only the farthest ~1% lateral pairs for one launch.)

LAM_DT = jnp.bfloat16  # pair impulse caches: a warm-start hint tolerates 8-bit
                       # mantissas, and bf16 halves the (B, SLAB) scratch arrays
N_SLOT = 4            # manifold points per pair (box-box uses all 4)
N_GEOM = 3 + 5 * N_SLOT   # big (B, SLAB) geometry scratch arrays
N_WARM = N_SLOT + 3   # per-slot normal-impulse caches + ONE pair tangent vector
N_PLANE = 4           # analytic bounded-plane slots (large static "hub" boxes)
PLANE_SC = 16         # scalars per plane in the scalar block
N_SMALL = 13 + 9 + 3 + 3 + 4 + N_PLANE * N_SLOT * 5 + 1  # (1, B) scratch arrays
N_PWARM = N_PLANE * N_SLOT * 4  # plane-contact impulse caches, (1, B) each


def _slab_start(c: int, b: int) -> int:
    return max(0, min(c * BCHUNK, b - SLAB))


def _banded_kernel(
    scalars_ref,  # f32 SMEM: [dt, gx, gy, gz, baumgarte, slop, margin, n_substeps,
    #            planes…, sleep_v2, sleep_time]
    posx, posy, posz,
    velx, vely, velz,
    avx, avy, avz,
    qx, qy, qz, qw,
    inv_mass, im3x, im3y, im3z,
    hx, hy, hz, rad, hlen,
    fric, rest, grav, dof_x, dof_y, dof_z,
    is_box, dynamic, movable, act,
    asleep0, timer0, r_eff2, can_sleep,
    o_posx, o_posy, o_posz,
    o_velx, o_vely, o_velz,
    o_avx, o_avy, o_avz,
    o_qx, o_qy, o_qz, o_qw,
    o_sleep, o_timer,
    *scratch,
    iterations: int,
    n_bodies: int,
    warm: float = 0.0,
    geom_every: int = 1,
    sleep: bool = False,
):
    dt = scalars_ref[0]
    g = (scalars_ref[1], scalars_ref[2], scalars_ref[3])
    baumgarte = scalars_ref[4]
    slop = scalars_ref[5]
    margin = scalars_ref[6]
    n_sub = scalars_ref[7].astype(jnp.int32)
    sleep_v2 = scalars_ref[8 + N_PLANE * PLANE_SC]
    sleep_time = scalars_ref[8 + N_PLANE * PLANE_SC + 1]

    b = n_bodies
    n_chunks = b // BCHUNK

    # ---- unpack scratch ----------------------------------------------------
    geom = scratch[:N_GEOM]
    off = N_GEOM
    if geom_every > 1:
        g_d0 = scratch[off : off + N_SLOT]  # cached contact depth per slot
        off += N_SLOT
    if warm > 0.0:
        lam = scratch[off : off + N_WARM]
        off += N_WARM
        plam = scratch[off : off + N_PWARM]
        off += N_PWARM
        small = scratch[off:]
        # per slot: lam_n (B, SLAB); one shared pair tangent vector
        g_lam = [lam[k] for k in range(N_SLOT)]
        g_lamt = lam[N_SLOT : N_SLOT + 3]
        # per (plane, slot): [lam_n, lam_tx, lam_ty, lam_tz] (1, B)
        p_lam = [
            [plam[(p * N_SLOT + k) * 4 : (p * N_SLOT + k) * 4 + 4] for k in range(N_SLOT)]
            for p in range(N_PLANE)
        ]
        for ref in lam:
            ref[:] = jnp.zeros_like(ref[:])
        for ref in plam:
            ref[:] = jnp.zeros_like(ref[:])
    else:
        small = scratch[off:]
    (g_nx, g_ny, g_nz) = geom[:3]
    g_ra = [geom[3 + 5 * k : 3 + 5 * (k + 1)] for k in range(N_SLOT)]
    (
        s_px, s_py, s_pz, s_vx, s_vy, s_vz, s_wx, s_wy, s_wz,
        s_qx, s_qy, s_qz, s_qw,
        s_r00, s_r01, s_r02, s_r10, s_r11, s_r12, s_r20, s_r21, s_r22,
        s_ehx, s_ehy, s_ehz,
        s_cax, s_cay, s_caz,
        s_ime, s_imex, s_imey, s_imez,
    ) = small[:32]
    n_psmall = 32 + N_PLANE * N_SLOT * 5
    # per (plane, slot): [rax, ray, raz, ikn, bias]
    p_geo = [
        [small[32 + (p * N_SLOT + k) * 5 : 32 + (p * N_SLOT + k) * 5 + 5] for k in range(N_SLOT)]
        for p in range(N_PLANE)
    ]
    s_paircnt = small[n_psmall]  # cached pair-contact counts (1, B)
    if geom_every > 1:
        s_px0, s_py0, s_pz0 = small[n_psmall + 1 : n_psmall + 4]  # positions at last SAT

    def plane_scalars(p):
        o = 8 + p * PLANE_SC
        return dict(
            cx=scalars_ref[o + 0], cy=scalars_ref[o + 1], cz=scalars_ref[o + 2],
            nx=scalars_ref[o + 3], ny=scalars_ref[o + 4], nz=scalars_ref[o + 5],
            ux=scalars_ref[o + 6], uy=scalars_ref[o + 7], uz=scalars_ref[o + 8],
            vx=scalars_ref[o + 9], vy=scalars_ref[o + 10], vz=scalars_ref[o + 11],
            hu=scalars_ref[o + 12], hv=scalars_ref[o + 13], ht=scalars_ref[o + 14],
            mu=scalars_ref[o + 15],
        )

    # ---- stage state into scratch refs -------------------------------------
    s_px[:] = posx[:]; s_py[:] = posy[:]; s_pz[:] = posz[:]
    s_vx[:] = velx[:]; s_vy[:] = vely[:]; s_vz[:] = velz[:]
    s_wx[:] = avx[:]; s_wy[:] = avy[:]; s_wz[:] = avz[:]
    s_qx[:] = qx[:]; s_qy[:] = qy[:]; s_qz[:] = qz[:]; s_qw[:] = qw[:]
    if sleep:
        s_sleep, s_timer, s_pusher, s_awakef = scratch[-4:]
        s_sleep[:] = asleep0[:]
        s_timer[:] = timer0[:]
        s_awakef[:] = 1.0 - asleep0[:]

    def rowT(ref, start):
        """Chunk rows of a (1, B) ref as a (BCHUNK, 1) column."""
        return jnp.swapaxes(ref[0:1, start : start + BCHUNK], 0, 1)

    def colS(ref, cs):
        """Slab lanes of a (1, B) ref as a (1, SLAB) row."""
        return ref[0:1, cs : cs + SLAB]

    def body_substep(step_i, carry):
      def _active_substep():
            # --- integrate velocities (gravity; dynamics only) -------------------
            grav_dt = grav[:] * dynamic[:] * dt
            if sleep:
                grav_dt = grav_dt * (1.0 - s_sleep[:])
            s_vx[:] = s_vx[:] + g[0] * grav_dt
            s_vy[:] = s_vy[:] + g[1] * grav_dt
            s_vz[:] = s_vz[:] + g[2] * grav_dt

            cqx = s_qx[:]; cqy = s_qy[:]; cqz = s_qz[:]; cqw = s_qw[:]
            xx = cqx * cqx; yy = cqy * cqy; zz = cqz * cqz
            xy = cqx * cqy; xz = cqx * cqz; yz = cqy * cqz
            wx_ = cqw * cqx; wy_ = cqw * cqy; wz_ = cqw * cqz
            s_r00[:] = 1 - 2 * (yy + zz); s_r01[:] = 2 * (xy - wz_); s_r02[:] = 2 * (xz + wy_)
            s_r10[:] = 2 * (xy + wz_);    s_r11[:] = 1 - 2 * (xx + zz); s_r12[:] = 2 * (yz - wx_)
            s_r20[:] = 2 * (xz - wy_);    s_r21[:] = 2 * (yz + wx_);    s_r22[:] = 1 - 2 * (xx + yy)

            box_f = is_box[:]
            lhx = jnp.where(box_f > 0.5, hx[:], rad[:])
            lhy = jnp.where(box_f > 0.5, hy[:], rad[:] + hlen[:])
            lhz = jnp.where(box_f > 0.5, hz[:], rad[:])
            s_ehx[:] = jnp.abs(s_r00[:]) * lhx + jnp.abs(s_r01[:]) * lhy + jnp.abs(s_r02[:]) * lhz + margin
            s_ehy[:] = jnp.abs(s_r10[:]) * lhx + jnp.abs(s_r11[:]) * lhy + jnp.abs(s_r12[:]) * lhz + margin
            s_ehz[:] = jnp.abs(s_r20[:]) * lhx + jnp.abs(s_r21[:]) * lhy + jnp.abs(s_r22[:]) * lhz + margin

            s_cax[:] = s_r01[:] * hlen[:]
            s_cay[:] = s_r11[:] * hlen[:]
            s_caz[:] = s_r21[:] * hlen[:]

            # ============== phase 1: geometry + AABB counts ========================
            # With geom_every > 1 the SAT manifold build runs on every geom_every-th
            # substep (the Jolt-style contact cache, `BodyPairCache`); between
            # rebuilds only the Baumgarte bias is refreshed from the cached depth
            # and the position drift along the cached normal.
            def build_pair_geometry():
              row_counts = []
              col_cnt = jnp.zeros((1, b), jnp.float32)
              for _c in range(n_chunks):
                start = _c * BCHUNK
                cs = _slab_start(_c, b)
                row = lambda ref: rowT(ref, start)
                col = lambda ref: colS(ref, cs)

                dxc = col(s_px) - row(s_px)
                dyc = col(s_py) - row(s_py)
                dzc = col(s_pz) - row(s_pz)
                overlap = (
                    (jnp.abs(dxc) <= row(s_ehx) + col(s_ehx))
                    & (jnp.abs(dyc) <= row(s_ehy) + col(s_ehy))
                    & (jnp.abs(dzc) <= row(s_ehz) + col(s_ehz))
                )
                some_dyn = (row(dynamic) + col(dynamic)) > 0.5
                both_act = (row(act) * col(act)) > 0.5
                a_ids = jax.lax.broadcasted_iota(jnp.int32, (BCHUNK, SLAB), 0) + start
                b_ids = jax.lax.broadcasted_iota(jnp.int32, (BCHUNK, SLAB), 1) + cs
                delta = b_ids - a_ids
                in_band = (delta >= 1) & (delta <= BAND)
                active = overlap & some_dyn & both_act & in_band

                ovf = active.astype(jnp.float32)
                # single ordering: each pair counts once on each side
                row_counts.append(
                    jnp.swapaxes(jnp.sum(ovf, axis=1, keepdims=True), 0, 1)
                )
                cpart = jnp.sum(ovf, axis=0, keepdims=True)  # (1, SLAB)
                upd = col_cnt[0:1, cs : cs + SLAB] + cpart
                pieces = []
                if cs > 0:
                    pieces.append(col_cnt[0:1, 0:cs])
                pieces.append(upd)
                if cs + SLAB < b:
                    pieces.append(col_cnt[0:1, cs + SLAB : b])
                col_cnt = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)

                # ---- contact generation (same model as megakernel._kernel) -------
                r_box = row(is_box); c_box = col(is_box)
                both_round = (r_box < 0.5) & (c_box < 0.5)
                a_box = r_box > 0.5
                b_box = c_box > 0.5
                r_rad = row(rad); c_rad = col(rad)
                r_hx = row(hx); r_hy = row(hy); r_hz = row(hz)
                c_hx = col(hx); c_hy = col(hy); c_hz = col(hz)
                rr = [
                    [row(s_r00), row(s_r01), row(s_r02)],
                    [row(s_r10), row(s_r11), row(s_r12)],
                    [row(s_r20), row(s_r21), row(s_r22)],
                ]
                cr = [
                    [col(s_r00), col(s_r01), col(s_r02)],
                    [col(s_r10), col(s_r11), col(s_r12)],
                    [col(s_r20), col(s_r21), col(s_r22)],
                ]

                relx = dxc; rely = dyc; relz = dzc
                adx = row(s_cax); ady = row(s_cay); adz = row(s_caz)
                bdx = col(s_cax); bdy = col(s_cay); bdz = col(s_caz)
                bd2 = bdx * bdx + bdy * bdy + bdz * bdz + 1e-9
                tb = jnp.clip(-(relx * bdx + rely * bdy + relz * bdz) / bd2, -1.0, 1.0)
                bxp = -relx + tb * bdx
                byp = -rely + tb * bdy
                bzp = -relz + tb * bdz
                ad2 = adx * adx + ady * ady + adz * adz + 1e-9
                ta = jnp.clip((bxp * adx + byp * ady + bzp * adz) / ad2, -1.0, 1.0)
                sxp = bxp - ta * adx
                syp = byp - ta * ady
                szp = bzp - ta * adz
                dist_cc = jnp.sqrt(sxp * sxp + syp * syp + szp * szp) + 1e-9
                ncc_x = -sxp / dist_cc
                ncc_y = -syp / dist_cc
                ncc_z = -szp / dist_cc
                depth_cc = r_rad + c_rad - dist_cc
                pcc_x = ta * adx + ncc_x * (r_rad + depth_cc * 0.5)
                pcc_y = ta * ady + ncc_y * (r_rad + depth_cc * 0.5)
                pcc_z = ta * adz + ncc_z * (r_rad + depth_cc * 0.5)

                lax_ = rr[0][0] * dxc + rr[1][0] * dyc + rr[2][0] * dzc
                lay = rr[0][1] * dxc + rr[1][1] * dyc + rr[2][1] * dzc
                laz = rr[0][2] * dxc + rr[1][2] * dyc + rr[2][2] * dzc
                clx = jnp.clip(lax_, -r_hx, r_hx)
                cly = jnp.clip(lay, -r_hy, r_hy)
                clz = jnp.clip(laz, -r_hz, r_hz)
                ddx = lax_ - clx; ddy = lay - cly; ddz = laz - clz
                out_d = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                outside = out_d > 1e-6
                fdx = r_hx - jnp.abs(lax_)
                fdy = r_hy - jnp.abs(lay)
                fdz = r_hz - jnp.abs(laz)
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
                sd = jnp.where(outside, -out_d, fmin)
                depth_bc = sd + c_rad
                nbc_x = rr[0][0] * nl_x + rr[0][1] * nl_y + rr[0][2] * nl_z
                nbc_y = rr[1][0] * nl_x + rr[1][1] * nl_y + rr[1][2] * nl_z
                nbc_z = rr[2][0] * nl_x + rr[2][1] * nl_y + rr[2][2] * nl_z
                pbc_x = dxc - nbc_x * c_rad
                pbc_y = dyc - nbc_y * c_rad
                pbc_z = dzc - nbc_z * c_rad

                lbx = cr[0][0] * -dxc + cr[1][0] * -dyc + cr[2][0] * -dzc
                lby = cr[0][1] * -dxc + cr[1][1] * -dyc + cr[2][1] * -dzc
                lbz = cr[0][2] * -dxc + cr[1][2] * -dyc + cr[2][2] * -dzc
                cbx = jnp.clip(lbx, -c_hx, c_hx)
                cby = jnp.clip(lby, -c_hy, c_hy)
                cbz = jnp.clip(lbz, -c_hz, c_hz)
                edx = lbx - cbx; edy = lby - cby; edz = lbz - cbz
                eod = jnp.sqrt(edx * edx + edy * edy + edz * edz)
                eoutside = eod > 1e-6
                gdx = c_hx - jnp.abs(lbx)
                gdy = c_hy - jnp.abs(lby)
                gdz = c_hz - jnp.abs(lbz)
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
                depth_cb = esd + r_rad
                ncb_x = -(cr[0][0] * ml_x + cr[0][1] * ml_y + cr[0][2] * ml_z)
                ncb_y = -(cr[1][0] * ml_x + cr[1][1] * ml_y + cr[1][2] * ml_z)
                ncb_z = -(cr[2][0] * ml_x + cr[2][1] * ml_y + cr[2][2] * ml_z)
                pcb_x = ncb_x * r_rad
                pcb_y = ncb_y * r_rad
                pcb_z = ncb_z * r_rad

                def proj_pair(ax, ay, az):
                    pa = (
                        jnp.abs(ax * rr[0][0] + ay * rr[1][0] + az * rr[2][0]) * r_hx
                        + jnp.abs(ax * rr[0][1] + ay * rr[1][1] + az * rr[2][1]) * r_hy
                        + jnp.abs(ax * rr[0][2] + ay * rr[1][2] + az * rr[2][2]) * r_hz
                    )
                    pb = (
                        jnp.abs(ax * cr[0][0] + ay * cr[1][0] + az * cr[2][0]) * c_hx
                        + jnp.abs(ax * cr[0][1] + ay * cr[1][1] + az * cr[2][1]) * c_hy
                        + jnp.abs(ax * cr[0][2] + ay * cr[1][2] + az * cr[2][2]) * c_hz
                    )
                    dist = jnp.abs(ax * dxc + ay * dyc + az * dzc)
                    return pa + pb - dist

                best_depth = jnp.full((BCHUNK, SLAB), 1e30)
                nbb_x = jnp.zeros((BCHUNK, SLAB)); nbb_y = jnp.zeros((BCHUNK, SLAB))
                nbb_z = jnp.zeros((BCHUNK, SLAB))
                ref_is_a = jnp.ones((BCHUNK, SLAB), jnp.float32)
                axes = [
                    (rr[0][0], rr[1][0], rr[2][0], 1.0),
                    (rr[0][1], rr[1][1], rr[2][1], 1.0),
                    (rr[0][2], rr[1][2], rr[2][2], 1.0),
                    (cr[0][0], cr[1][0], cr[2][0], 0.0),
                    (cr[0][1], cr[1][1], cr[2][1], 0.0),
                    (cr[0][2], cr[1][2], cr[2][2], 0.0),
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
                sgn = jnp.sign(nbb_x * dxc + nbb_y * dyc + nbb_z * dzc + 1e-12)
                nbb_x = nbb_x * sgn; nbb_y = nbb_y * sgn; nbb_z = nbb_z * sgn
                depth_bb = best_depth

                a_axes = (
                    (rr[0][0], rr[1][0], rr[2][0], r_hx),
                    (rr[0][1], rr[1][1], rr[2][1], r_hy),
                    (rr[0][2], rr[1][2], rr[2][2], r_hz),
                )
                b_axes = (
                    (cr[0][0], cr[1][0], cr[2][0], c_hx),
                    (cr[0][1], cr[1][1], cr[2][1], c_hy),
                    (cr[0][2], cr[1][2], cr[2][2], c_hz),
                )

                def incident_face(axes3, toward_n_sign):
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

                fb, ub, vb_ = incident_face(b_axes, 1.0)
                fa, ua, va_ = incident_face(a_axes, -1.0)
                ra_mask = ref_is_a

                pa_n = (
                    jnp.abs(nbb_x * rr[0][0] + nbb_y * rr[1][0] + nbb_z * rr[2][0]) * r_hx
                    + jnp.abs(nbb_x * rr[0][1] + nbb_y * rr[1][1] + nbb_z * rr[2][1]) * r_hy
                    + jnp.abs(nbb_x * rr[0][2] + nbb_y * rr[1][2] + nbb_z * rr[2][2]) * r_hz
                )
                pb_n = (
                    jnp.abs(nbb_x * cr[0][0] + nbb_y * cr[1][0] + nbb_z * cr[2][0]) * c_hx
                    + jnp.abs(nbb_x * cr[0][1] + nbb_y * cr[1][1] + nbb_z * cr[2][1]) * c_hy
                    + jnp.abs(nbb_x * cr[0][2] + nbb_y * cr[1][2] + nbb_z * cr[2][2]) * c_hz
                )

                bb_pts = []
                for su, sv in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
                    cbx_ = dxc + fb[0] + su * ub[0] + sv * vb_[0]
                    cby_ = dyc + fb[1] + su * ub[1] + sv * vb_[1]
                    cbz_ = dzc + fb[2] + su * ub[2] + sv * vb_[2]
                    dep_b = pa_n - (cbx_ * nbb_x + cby_ * nbb_y + cbz_ * nbb_z)
                    lxa = jnp.clip(rr[0][0] * cbx_ + rr[1][0] * cby_ + rr[2][0] * cbz_, -r_hx, r_hx)
                    lya = jnp.clip(rr[0][1] * cbx_ + rr[1][1] * cby_ + rr[2][1] * cbz_, -r_hy, r_hy)
                    lza = jnp.clip(rr[0][2] * cbx_ + rr[1][2] * cby_ + rr[2][2] * cbz_, -r_hz, r_hz)
                    cbx_c = rr[0][0] * lxa + rr[0][1] * lya + rr[0][2] * lza
                    cby_c = rr[1][0] * lxa + rr[1][1] * lya + rr[1][2] * lza
                    cbz_c = rr[2][0] * lxa + rr[2][1] * lya + rr[2][2] * lza
                    cax_ = fa[0] + su * ua[0] + sv * va_[0]
                    cay_ = fa[1] + su * ua[1] + sv * va_[1]
                    caz_ = fa[2] + su * ua[2] + sv * va_[2]
                    dep_a = pb_n + ((cax_ - dxc) * nbb_x + (cay_ - dyc) * nbb_y + (caz_ - dzc) * nbb_z)
                    lxb = jnp.clip(cr[0][0] * (cax_ - dxc) + cr[1][0] * (cay_ - dyc) + cr[2][0] * (caz_ - dzc), -c_hx, c_hx)
                    lyb = jnp.clip(cr[0][1] * (cax_ - dxc) + cr[1][1] * (cay_ - dyc) + cr[2][1] * (caz_ - dzc), -c_hy, c_hy)
                    lzb = jnp.clip(cr[0][2] * (cax_ - dxc) + cr[1][2] * (cay_ - dyc) + cr[2][2] * (caz_ - dzc), -c_hz, c_hz)
                    cax_c = dxc + cr[0][0] * lxb + cr[0][1] * lyb + cr[0][2] * lzb
                    cay_c = dyc + cr[1][0] * lxb + cr[1][1] * lyb + cr[1][2] * lzb
                    caz_c = dzc + cr[2][0] * lxb + cr[2][1] * lyb + cr[2][2] * lzb
                    px_k = jnp.where(ra_mask > 0.5, cbx_c, cax_c)
                    py_k = jnp.where(ra_mask > 0.5, cby_c, cay_c)
                    pz_k = jnp.where(ra_mask > 0.5, cbz_c, caz_c)
                    dep_k = jnp.where(ra_mask > 0.5, dep_b, dep_a)
                    dep_k = jnp.where(depth_bb > 0.0, dep_k, -1e9)
                    bb_pts.append((px_k, py_k, pz_k, dep_k))

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
                for k in range(1, N_SLOT):
                    slots.append(
                        (
                            bb_pts[k][0],
                            bb_pts[k][1],
                            bb_pts[k][2],
                            jnp.where(is_bb, bb_pts[k][3], neg),
                        )
                    )

                # ---- store geometry for this chunk -------------------------------
                sl = slice(start, start + BCHUNK)
                g_nx[sl, :] = nx; g_ny[sl, :] = ny; g_nz[sl, :] = nz
                for k in range(N_SLOT):
                    rpx, rpy, rpz, depth = slots[k]
                    s_rax, s_ray, s_raz, _s_ikn, s_bias = g_ra[k]
                    s_rax[sl, :] = rpx; s_ray[sl, :] = rpy; s_raz[sl, :] = rpz
                    # non-touching pairs get bias = -1e30: lam = max(0, -(vn-bias)/kn)
                    # and lam_t = min(tvl/kn, mu*lam) both collapse to 0 — no separate
                    # touching-mask cache needed
                    d0v = jnp.where(active, depth, -1e30)
                    if geom_every > 1:
                        g_d0[k][sl, :] = d0v
                    s_bias[sl, :] = jnp.where(
                        d0v > 0.0,
                        baumgarte / dt * jnp.maximum(d0v - slop, 0.0),
                        -1e30,
                    )
              s_paircnt[:] = (
                  row_counts[0] if n_chunks == 1 else jnp.concatenate(row_counts, axis=1)
              ) + col_cnt
              if geom_every > 1:
                  s_px0[:] = s_px[:]; s_py0[:] = s_py[:]; s_pz0[:] = s_pz[:]

            def refresh_pair_bias():
              for _c in range(n_chunks):
                start = _c * BCHUNK
                cs = _slab_start(_c, b)
                sl = slice(start, start + BCHUNK)
                ddx = (colS(s_px, cs) - colS(s_px0, cs)) - (rowT(s_px, start) - rowT(s_px0, start))
                ddy = (colS(s_py, cs) - colS(s_py0, cs)) - (rowT(s_py, start) - rowT(s_py0, start))
                ddz = (colS(s_pz, cs) - colS(s_pz0, cs)) - (rowT(s_pz, start) - rowT(s_pz0, start))
                nx = g_nx[sl, :]; ny = g_ny[sl, :]; nz = g_nz[sl, :]
                for k in range(N_SLOT):
                    _1, _2, _3, _4, s_bias = g_ra[k]
                    d = g_d0[k][sl, :] - (ddx * nx + ddy * ny + ddz * nz)
                    s_bias[sl, :] = jnp.where(
                        d > 0.0, baumgarte / dt * jnp.maximum(d - slop, 0.0), -1e30
                    )

            if geom_every > 1:
                rebuild = (step_i % geom_every) == 0
                pl.when(rebuild)(build_pair_geometry)
                pl.when(jnp.logical_not(rebuild))(refresh_pair_bias)
            else:
                build_pair_geometry()

            # ---- analytic bounded planes (large static hub boxes) ----------------
            # Each plane is a two-sided slab face: bodies contact the side they are on.
            # Contact manifold: 4 incident-face corners for boxes; capsule end caps /
            # sphere center for round shapes. Per-body (1, B) math — no pair space.
            plane_cnt = jnp.zeros((1, b), jnp.float32)
            pposx = s_px[:]; pposy = s_py[:]; pposz = s_pz[:]
            body_ax = [
                (s_r00[:], s_r10[:], s_r20[:], hx[:]),
                (s_r01[:], s_r11[:], s_r21[:], hy[:]),
                (s_r02[:], s_r12[:], s_r22[:], hz[:]),
            ]
            box_b = is_box[:] > 0.5
            dyn_b = dynamic[:] > 0.5
            caxv = s_cax[:]; cayv = s_cay[:]; cazv = s_caz[:]
            radv = rad[:]; hlenv = hlen[:]
            for p in range(N_PLANE):
                P = plane_scalars(p)
                p_act = P["hu"] > 0.0  # inactive planes carry hu = -1
                dpx = pposx - P["cx"]; dpy = pposy - P["cy"]; dpz = pposz - P["cz"]
                side = P["nx"] * dpx + P["ny"] * dpy + P["nz"] * dpz
                sgn_p = jnp.where(side >= 0.0, 1.0, -1.0)
                nex = P["nx"] * sgn_p; ney = P["ny"] * sgn_p; nez = P["nz"] * sgn_p

                # box incident face: the body face pointing most against the plane normal
                dots = [a[0] * nex + a[1] * ney + a[2] * nez for a in body_ax]
                absd = [jnp.abs(d) for d in dots]
                k0 = (absd[0] >= absd[1]) & (absd[0] >= absd[2])
                k1 = (~k0) & (absd[1] >= absd[2])
                k2 = (~k0) & (~k1)
                masks = [k0.astype(jnp.float32), k1.astype(jnp.float32), k2.astype(jnp.float32)]
                fx = fy = fz = 0.0
                ufx = ufy = ufz = 0.0
                vfx = vfy = vfz = 0.0
                for kk in range(3):
                    m = masks[kk]
                    sgn_k = -jnp.sign(dots[kk] + 1e-12)
                    akx, aky, akz, hk = body_ax[kk]
                    fx = fx + m * sgn_k * akx * hk
                    fy = fy + m * sgn_k * aky * hk
                    fz = fz + m * sgn_k * akz * hk
                    iux, iuy, iuz, hu_ = body_ax[(kk + 1) % 3]
                    ivx, ivy, ivz, hv_ = body_ax[(kk + 2) % 3]
                    ufx = ufx + m * iux * hu_
                    ufy = ufy + m * iuy * hu_
                    ufz = ufz + m * iuz * hu_
                    vfx = vfx + m * ivx * hv_
                    vfy = vfy + m * ivy * hv_
                    vfz = vfz + m * ivz * hv_

                for k in range(N_SLOT):
                    if k == 0:
                        su, sv = 1.0, 1.0
                    elif k == 1:
                        su, sv = 1.0, -1.0
                    elif k == 2:
                        su, sv = -1.0, 1.0
                    else:
                        su, sv = -1.0, -1.0
                    # box corner offset from body center
                    bx = fx + su * ufx + sv * vfx
                    by = fy + su * ufy + sv * vfy
                    bz = fz + su * ufz + sv * vfz
                    # round-shape contact offsets: capsule end caps (slots 0/1)
                    if k == 0:
                        ox = caxv - nex * radv; oy = cayv - ney * radv; oz = cazv - nez * radv
                    elif k == 1:
                        ox = -caxv - nex * radv; oy = -cayv - ney * radv; oz = -cazv - nez * radv
                    else:
                        ox = oy = oz = None
                    if ox is None:
                        rax = bx; ray = by; raz = bz
                        shape_ok = box_b
                    else:
                        rax = jnp.where(box_b, bx, ox)
                        ray = jnp.where(box_b, by, oy)
                        raz = jnp.where(box_b, bz, oz)
                        # slot 1 for spheres duplicates slot 0 — mask it
                        shape_ok = box_b | (hlenv > 1e-6) if k == 1 else jnp.full_like(box_b, True)
                    # penetration of the contact point below the slab surface
                    wx_c = dpx + rax; wy_c = dpy + ray; wz_c = dpz + raz
                    hgt = nex * wx_c + ney * wy_c + nez * wz_c
                    depth = P["ht"] - hgt
                    pu = P["ux"] * wx_c + P["uy"] * wy_c + P["uz"] * wz_c
                    pv = P["vx"] * wx_c + P["vy"] * wy_c + P["vz"] * wz_c
                    inb = (jnp.abs(pu) <= P["hu"] + margin) & (jnp.abs(pv) <= P["hv"] + margin)
                    touching = p_act & dyn_b & shape_ok & inb & (depth > 0.0) & (act[:] > 0.5)
                    s_prax, s_pray, s_praz, _s_pikn, s_pbias = p_geo[p][k]
                    s_prax[:] = rax; s_pray[:] = ray; s_praz[:] = raz
                    s_pbias[:] = jnp.where(
                        touching, baumgarte / dt * jnp.maximum(depth - slop, 0.0), -1e30
                    )
                    plane_cnt = plane_cnt + touching.astype(jnp.float32)

            cnt = s_paircnt[:] + plane_cnt
            split = jnp.maximum(cnt, 1.0)
            # NOTE deliberately NOT masking split/s_ime for sleeping bodies:
            # sleeping sides keep their normal solver mass. Infinite-mass gating
            # was tried and explodes on wake — the cached ikn/lambda equilibria
            # become inconsistent with the restored mass and the warm replay
            # amplifies the mismatch exponentially. With normal mass the caches
            # stay at the pre-sleep equilibrium (the sleeping side just ignores
            # its impulse share via the movement mask), which is stable and
            # matches Jolt's invariant that intra-island resting contacts sleep together.
            s_ime[:] = inv_mass[:] * split
            s_imex[:] = im3x[:] * split
            s_imey[:] = im3y[:] * split
            s_imez[:] = im3z[:] * split

            # ============== phase 2: effective masses (1/kn) =======================
            def build_pair_ikn():
              for _c in range(n_chunks):
                start = _c * BCHUNK
                cs = _slab_start(_c, b)
                sl = slice(start, start + BCHUNK)
                row = lambda ref: rowT(ref, start)
                col = lambda ref: colS(ref, cs)

                nx = g_nx[sl, :]; ny = g_ny[sl, :]; nz = g_nz[sl, :]
                dxc = colS(s_px, cs) - rowT(s_px, start)
                dyc = colS(s_py, cs) - rowT(s_py, start)
                dzc = colS(s_pz, cs) - rowT(s_pz, start)
                for k in range(N_SLOT):
                    s_rax, s_ray, s_raz, s_ikn, _s_bias = g_ra[k]
                    rax = s_rax[sl, :]; ray = s_ray[sl, :]; raz = s_raz[sl, :]
                    rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc
                    raxn_x = ray * nz - raz * ny
                    raxn_y = raz * nx - rax * nz
                    raxn_z = rax * ny - ray * nx
                    rbxn_x = rby * nz - rbz * ny
                    rbxn_y = rbz * nx - rbx * nz
                    rbxn_z = rbx * ny - rby * nx
                    ang_a = (
                        row(s_imex) * raxn_x**2
                        + row(s_imey) * raxn_y**2
                        + row(s_imez) * raxn_z**2
                    )
                    ang_b = (
                        col(s_imex) * rbxn_x**2
                        + col(s_imey) * rbxn_y**2
                        + col(s_imez) * rbxn_z**2
                    )
                    kn = row(s_ime) + col(s_ime) + ang_a + ang_b + 1e-9
                    s_ikn[sl, :] = 1.0 / kn

            if geom_every > 1:
                pl.when((step_i % geom_every) == 0)(build_pair_ikn)
            else:
                build_pair_ikn()

            # plane-contact effective masses (body side only; plane is infinite mass)
            for p in range(N_PLANE):
                P = plane_scalars(p)
                side = (
                    P["nx"] * (s_px[:] - P["cx"])
                    + P["ny"] * (s_py[:] - P["cy"])
                    + P["nz"] * (s_pz[:] - P["cz"])
                )
                sgn_p = jnp.where(side >= 0.0, 1.0, -1.0)
                nex = P["nx"] * sgn_p; ney = P["ny"] * sgn_p; nez = P["nz"] * sgn_p
                for k in range(N_SLOT):
                    s_prax, s_pray, s_praz, s_pikn, _s_pbias = p_geo[p][k]
                    rax = s_prax[:]; ray = s_pray[:]; raz = s_praz[:]
                    cxn = ray * nez - raz * ney
                    cyn = raz * nex - rax * nez
                    czn = rax * ney - ray * nex
                    kn = (
                        s_ime[:]
                        + s_imex[:] * cxn**2 + s_imey[:] * cyn**2 + s_imez[:] * czn**2
                        + 1e-9
                    )
                    s_pikn[:] = 1.0 / kn

            # ============== phase 3: solver sweeps over cached geometry ============
            # warm > 0 switches the sweep math to accumulated-impulse clamping with
            # per-slot lambda caches: a "warm" pass first re-applies decay*lambda_prev
            # (contacts persist across substeps since rank assignment is fixed per
            # launch), then each sweep adjusts the accumulated lambda and applies only
            # the delta. Resting stacks then start each substep pre-loaded with the
            # correct impulse, so ~4 sweeps match 10 cold Jacobi sweeps.
            def solve_iter(_, icarry, is_warm=False):
                row_parts = []
                colacc = [jnp.zeros((1, b), jnp.float32) for _ in range(6)]
                for _c in range(n_chunks):
                    start = _c * BCHUNK
                    cs = _slab_start(_c, b)
                    sl = slice(start, start + BCHUNK)
                    row = lambda ref: rowT(ref, start)
                    col = lambda ref: colS(ref, cs)

                    nx = g_nx[sl, :]; ny = g_ny[sl, :]; nz = g_nz[sl, :]
                    mu = jnp.sqrt(row(fric) * col(fric))
                    dxc = col(s_px) - row(s_px)
                    dyc = col(s_py) - row(s_py)
                    dzc = col(s_pz) - row(s_pz)

                    r_vx = row(s_vx); r_vy = row(s_vy); r_vz = row(s_vz)
                    r_wx = row(s_wx); r_wy = row(s_wy); r_wz = row(s_wz)
                    c_vx = col(s_vx); c_vy = col(s_vy); c_vz = col(s_vz)
                    c_wx = col(s_wx); c_wy = col(s_wy); c_wz = col(s_wz)

                    jx_t = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    jy_t = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    jz_t = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    ta_x = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    ta_y = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    ta_z = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    tb_x = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    tb_y = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    tb_z = jnp.zeros((BCHUNK, SLAB), jnp.float32)

                    def apply(jx, jy, jz, rax, ray, raz, rbx, rby, rbz):
                        nonlocal jx_t, jy_t, jz_t, ta_x, ta_y, ta_z, tb_x, tb_y, tb_z
                        jx_t = jx_t + jx; jy_t = jy_t + jy; jz_t = jz_t + jz
                        ta_x = ta_x + ray * jz - raz * jy
                        ta_y = ta_y + raz * jx - rax * jz
                        ta_z = ta_z + rax * jy - ray * jx
                        tb_x = tb_x + rby * jz - rbz * jy
                        tb_y = tb_y + rbz * jx - rbx * jz
                        tb_z = tb_z + rbx * jy - rby * jx

                    if warm > 0.0:
                        # manifold-level solve: per-slot NORMAL impulses (accumulated
                        # clamp against the bf16 lambda caches), then ONE friction
                        # solve per pair at the touching-point centroid capped by
                        # mu * sum(lambda_n) — 4 tangent solves collapse to 1
                        sum_ln = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                        c_ax = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                        c_ay = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                        c_az = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                        c_w = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                        for k in range(N_SLOT):
                            s_rax, s_ray, s_raz, s_ikn, s_bias = g_ra[k]
                            rax = s_rax[sl, :]; ray = s_ray[sl, :]; raz = s_raz[sl, :]
                            bias = s_bias[sl, :]
                            rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc
                            touch = (bias > -1e29).astype(jnp.float32)
                            s_ln = g_lam[k]
                            if is_warm:
                                lamw = (
                                    s_ln[sl, :].astype(jnp.float32) * (touch * warm)
                                ).astype(LAM_DT)
                                s_ln[sl, :] = lamw
                                ln_eff = lamw.astype(jnp.float32)
                                dl = ln_eff
                            else:
                                ikn = s_ikn[sl, :]
                                rvx = c_vx + c_wy * rbz - c_wz * rby - (r_vx + r_wy * raz - r_wz * ray)
                                rvy = c_vy + c_wz * rbx - c_wx * rbz - (r_vy + r_wz * rax - r_wx * raz)
                                rvz = c_vz + c_wx * rby - c_wy * rbx - (r_vz + r_wx * ray - r_wy * rax)
                                vn = rvx * nx + rvy * ny + rvz * nz
                                ln_old = s_ln[sl, :].astype(jnp.float32)
                                ln_store = jnp.maximum(
                                    ln_old - (vn - bias) * ikn, 0.0
                                ).astype(LAM_DT)
                                s_ln[sl, :] = ln_store
                                ln_eff = ln_store.astype(jnp.float32)
                                dl = ln_eff - ln_old
                            sum_ln = sum_ln + ln_eff
                            apply(nx * dl, ny * dl, nz * dl, rax, ray, raz, rbx, rby, rbz)
                            c_ax = c_ax + touch * rax
                            c_ay = c_ay + touch * ray
                            c_az = c_az + touch * raz
                            c_w = c_w + touch

                        # pair friction at the manifold centroid
                        inv_cw = 1.0 / jnp.maximum(c_w, 1.0)
                        rax = c_ax * inv_cw; ray = c_ay * inv_cw; raz = c_az * inv_cw
                        rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc
                        s_ltx, s_lty, s_ltz = g_lamt
                        ltx_old = s_ltx[sl, :].astype(jnp.float32)
                        lty_old = s_lty[sl, :].astype(jnp.float32)
                        ltz_old = s_ltz[sl, :].astype(jnp.float32)
                        if is_warm:
                            gate = (c_w > 0.5).astype(jnp.float32) * warm
                            ltx_s = (ltx_old * gate).astype(LAM_DT)
                            lty_s = (lty_old * gate).astype(LAM_DT)
                            ltz_s = (ltz_old * gate).astype(LAM_DT)
                            djx = ltx_s.astype(jnp.float32)
                            djy = lty_s.astype(jnp.float32)
                            djz = ltz_s.astype(jnp.float32)
                        else:
                            ikn0 = g_ra[0][3][sl, :]
                            rvx = c_vx + c_wy * rbz - c_wz * rby - (r_vx + r_wy * raz - r_wz * ray)
                            rvy = c_vy + c_wz * rbx - c_wx * rbz - (r_vy + r_wz * rax - r_wx * raz)
                            rvz = c_vz + c_wx * rby - c_wy * rbx - (r_vz + r_wx * ray - r_wy * rax)
                            vn = rvx * nx + rvy * ny + rvz * nz
                            tvx = rvx - vn * nx
                            tvy = rvy - vn * ny
                            tvz = rvz - vn * nz
                            ltx_c = ltx_old - tvx * ikn0
                            lty_c = lty_old - tvy * ikn0
                            ltz_c = ltz_old - tvz * ikn0
                            ltl = jnp.sqrt(ltx_c * ltx_c + lty_c * lty_c + ltz_c * ltz_c) + 1e-9
                            tscale = jnp.minimum(mu * sum_ln / ltl, 1.0)
                            ltx_s = (ltx_c * tscale).astype(LAM_DT)
                            lty_s = (lty_c * tscale).astype(LAM_DT)
                            ltz_s = (ltz_c * tscale).astype(LAM_DT)
                            djx = ltx_s.astype(jnp.float32) - ltx_old
                            djy = lty_s.astype(jnp.float32) - lty_old
                            djz = ltz_s.astype(jnp.float32) - ltz_old
                        s_ltx[sl, :] = ltx_s; s_lty[sl, :] = lty_s; s_ltz[sl, :] = ltz_s
                        apply(djx, djy, djz, rax, ray, raz, rbx, rby, rbz)
                    else:
                      for k in range(N_SLOT):
                        s_rax, s_ray, s_raz, s_ikn, s_bias = g_ra[k]
                        rax = s_rax[sl, :]; ray = s_ray[sl, :]; raz = s_raz[sl, :]
                        ikn = s_ikn[sl, :]; bias = s_bias[sl, :]
                        rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc

                        rvx = c_vx + c_wy * rbz - c_wz * rby - (r_vx + r_wy * raz - r_wz * ray)
                        rvy = c_vy + c_wz * rbx - c_wx * rbz - (r_vy + r_wz * rax - r_wx * raz)
                        rvz = c_vz + c_wx * rby - c_wy * rbx - (r_vz + r_wx * ray - r_wy * rax)
                        vn = rvx * nx + rvy * ny + rvz * nz

                        lam = jnp.maximum(-(vn - bias) * ikn, 0.0)

                        tvx = rvx - vn * nx
                        tvy = rvy - vn * ny
                        tvz = rvz - vn * nz
                        tvl = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz) + 1e-9
                        lam_t = jnp.minimum(tvl * ikn, mu * lam)
                        jx = nx * lam - tvx / tvl * lam_t
                        jy = ny * lam - tvy / tvl * lam_t
                        jz = nz * lam - tvz / tvl * lam_t
                        apply(jx, jy, jz, rax, ray, raz, rbx, rby, rbz)

                    rT = lambda m: jnp.swapaxes(jnp.sum(m, axis=1, keepdims=True), 0, 1)
                    cS = lambda m: jnp.sum(m, axis=0, keepdims=True)
                    row_parts.append(
                        (-rT(jx_t), -rT(jy_t), -rT(jz_t), -rT(ta_x), -rT(ta_y), -rT(ta_z))
                    )
                    cparts = (cS(jx_t), cS(jy_t), cS(jz_t), cS(tb_x), cS(tb_y), cS(tb_z))
                    for i in range(6):
                        # static in-place slab add via lane-axis concatenation —
                        # Mosaic has no dynamic_update_slice on values
                        updated = colacc[i][0:1, cs : cs + SLAB] + cparts[i]
                        pieces = []
                        if cs > 0:
                            pieces.append(colacc[i][0:1, 0:cs])
                        pieces.append(updated)
                        if cs + SLAB < b:
                            pieces.append(colacc[i][0:1, cs + SLAB : b])
                        colacc[i] = (
                            pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
                        )

                if n_chunks == 1:
                    totals = [row_parts[0][i] + colacc[i] for i in range(6)]
                else:
                    totals = [
                        jnp.concatenate([rp[i] for rp in row_parts], axis=1) + colacc[i]
                        for i in range(6)
                    ]
                accx, accy, accz, tqx, tqy, tqz = totals

                # plane-contact impulses (body side only), full-width (1, B)
                bvx = s_vx[:]; bvy = s_vy[:]; bvz = s_vz[:]
                bwx = s_wx[:]; bwy = s_wy[:]; bwz = s_wz[:]
                fricv = fric[:]
                for p in range(N_PLANE):
                    P = plane_scalars(p)
                    side = (
                        P["nx"] * (s_px[:] - P["cx"])
                        + P["ny"] * (s_py[:] - P["cy"])
                        + P["nz"] * (s_pz[:] - P["cz"])
                    )
                    sgn_p = jnp.where(side >= 0.0, 1.0, -1.0)
                    nex = P["nx"] * sgn_p; ney = P["ny"] * sgn_p; nez = P["nz"] * sgn_p
                    mu_p = jnp.sqrt(fricv * P["mu"])
                    for k in range(N_SLOT):
                        s_prax, s_pray, s_praz, s_pikn, s_pbias = p_geo[p][k]
                        rax = s_prax[:]; ray = s_pray[:]; raz = s_praz[:]
                        ikn = s_pikn[:]; bias = s_pbias[:]

                        if is_warm:
                            s_ln, s_ltx, s_lty, s_ltz = p_lam[p][k]
                            touch = (bias > -1e29).astype(jnp.float32) * warm
                            lamw = s_ln[:] * touch
                            jx = nex * lamw + s_ltx[:] * touch
                            jy = ney * lamw + s_lty[:] * touch
                            jz = nez * lamw + s_ltz[:] * touch
                            s_ln[:] = lamw
                            s_ltx[:] = s_ltx[:] * touch
                            s_lty[:] = s_lty[:] * touch
                            s_ltz[:] = s_ltz[:] * touch
                            accx = accx + jx; accy = accy + jy; accz = accz + jz
                            tqx = tqx + ray * jz - raz * jy
                            tqy = tqy + raz * jx - rax * jz
                            tqz = tqz + rax * jy - ray * jx
                            continue

                        rvx = bvx + bwy * raz - bwz * ray
                        rvy = bvy + bwz * rax - bwx * raz
                        rvz = bvz + bwx * ray - bwy * rax
                        vn = rvx * nex + rvy * ney + rvz * nez

                        if warm > 0.0:
                            s_ln, s_ltx, s_lty, s_ltz = p_lam[p][k]
                            ln_old = s_ln[:]
                            ln_new = jnp.maximum(ln_old - (vn - bias) * ikn, 0.0)
                            dlam = ln_new - ln_old
                            s_ln[:] = ln_new
                            tvx = rvx - vn * nex
                            tvy = rvy - vn * ney
                            tvz = rvz - vn * nez
                            ltx_old = s_ltx[:]; lty_old = s_lty[:]; ltz_old = s_ltz[:]
                            ltx_c = ltx_old - tvx * ikn
                            lty_c = lty_old - tvy * ikn
                            ltz_c = ltz_old - tvz * ikn
                            ltl = jnp.sqrt(ltx_c * ltx_c + lty_c * lty_c + ltz_c * ltz_c) + 1e-9
                            tscale = jnp.minimum(mu_p * ln_new / ltl, 1.0)
                            ltx_n = ltx_c * tscale; lty_n = lty_c * tscale; ltz_n = ltz_c * tscale
                            s_ltx[:] = ltx_n; s_lty[:] = lty_n; s_ltz[:] = ltz_n
                            jx = nex * dlam + (ltx_n - ltx_old)
                            jy = ney * dlam + (lty_n - lty_old)
                            jz = nez * dlam + (ltz_n - ltz_old)
                            accx = accx + jx; accy = accy + jy; accz = accz + jz
                            tqx = tqx + ray * jz - raz * jy
                            tqy = tqy + raz * jx - rax * jz
                            tqz = tqz + rax * jy - ray * jx
                            continue

                        lam = jnp.maximum(-(vn - bias) * ikn, 0.0)
                        tvx = rvx - vn * nex
                        tvy = rvy - vn * ney
                        tvz = rvz - vn * nez
                        tvl = jnp.sqrt(tvx * tvx + tvy * tvy + tvz * tvz) + 1e-9
                        lam_t = jnp.minimum(tvl * ikn, mu_p * lam)
                        jx = nex * lam - tvx / tvl * lam_t
                        jy = ney * lam - tvy / tvl * lam_t
                        jz = nez * lam - tvz / tvl * lam_t
                        accx = accx + jx; accy = accy + jy; accz = accz + jz
                        tqx = tqx + ray * jz - raz * jy
                        tqy = tqy + raz * jx - rax * jz
                        tqz = tqz + rax * jy - ray * jx

                mov_f = movable[:]
                if sleep:
                    mov_f = mov_f * (1.0 - s_sleep[:])
                s_vx[:] = s_vx[:] + accx * inv_mass[:] * dof_x[:] * mov_f
                s_vy[:] = s_vy[:] + accy * inv_mass[:] * dof_y[:] * mov_f
                s_vz[:] = s_vz[:] + accz * inv_mass[:] * dof_z[:] * mov_f
                s_wx[:] = s_wx[:] + tqx * im3x[:] * mov_f
                s_wy[:] = s_wy[:] + tqy * im3y[:] * mov_f
                s_wz[:] = s_wz[:] + tqz * im3z[:] * mov_f
                return icarry

            if warm > 0.0:
                solve_iter(0, 0, is_warm=True)
            jax.lax.fori_loop(0, iterations, solve_iter, 0, unroll=False)

            # --- sleeping: wake propagation + deactivation timers -----------------
            if sleep:
                vxs = s_vx[:]; vys = s_vy[:]; vzs = s_vz[:]
                wxs = s_wx[:]; wys = s_wy[:]; wzs = s_wz[:]
                sp2 = vxs * vxs + vys * vys + vzs * vzs + r_eff2[:] * (
                    wxs * wxs + wys * wys + wzs * wzs
                )
                moving = (sp2 >= sleep_v2).astype(jnp.float32)
                awake_f = 1.0 - s_sleep[:]
                s_pusher[:] = dynamic[:] * awake_f * moving  # (1, B)
                # pair wake signal: touching pairs (cached bias sentinel) whose
                # other side is an awake MOVING dynamic body
                wake = jnp.zeros((1, b), jnp.float32)
                row_wakes = []
                for _c in range(n_chunks):
                    start = _c * BCHUNK
                    cs = _slab_start(_c, b)
                    sl = slice(start, start + BCHUNK)
                    touch = jnp.zeros((BCHUNK, SLAB), jnp.float32)
                    for k in range(N_SLOT):
                        touch = jnp.maximum(
                            touch, (g_ra[k][4][sl, :] > -1e29).astype(jnp.float32)
                        )
                    cpush = colS(s_pusher, cs)
                    rpush = rowT(s_pusher, start)
                    roww = jnp.sum(touch * cpush, axis=1, keepdims=True)  # (BCHUNK,1)
                    row_wakes.append(jnp.swapaxes(roww, 0, 1))
                    colw = jnp.sum(touch * rpush, axis=0, keepdims=True)  # (1,SLAB)
                    upd = wake[0:1, cs : cs + SLAB] + colw
                    pieces = []
                    if cs > 0:
                        pieces.append(wake[0:1, 0:cs])
                    pieces.append(upd)
                    if cs + SLAB < b:
                        pieces.append(wake[0:1, cs + SLAB : b])
                    wake = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
                wake = wake + (
                    row_wakes[0] if n_chunks == 1 else jnp.concatenate(row_wakes, axis=1)
                )
                wk = (wake > 0.5).astype(jnp.float32)
                eligible = (1.0 - moving) * can_sleep[:] * (1.0 - wk)
                timer = (s_timer[:] + dt) * eligible
                fall = (timer >= sleep_time).astype(jnp.float32) * eligible
                new_sleep = jnp.minimum(s_sleep[:] * (1.0 - wk) + fall, 1.0)
                s_sleep[:] = new_sleep
                s_timer[:] = timer
                s_awakef[:] = 1.0 - new_sleep
                keep = 1.0 - new_sleep  # deactivated bodies carry zero velocity
                s_vx[:] = vxs * keep; s_vy[:] = vys * keep; s_vz[:] = vzs * keep
                s_wx[:] = wxs * keep; s_wy[:] = wys * keep; s_wz[:] = wzs * keep

            # --- integrate positions ---------------------------------------------
            mov_dt = movable[:] * dt
            if sleep:
                mov_dt = mov_dt * (1.0 - s_sleep[:])
            s_px[:] = s_px[:] + s_vx[:] * mov_dt
            s_py[:] = s_py[:] + s_vy[:] * mov_dt
            s_pz[:] = s_pz[:] + s_vz[:] * mov_dt
            hq = 0.5 * dt
            wxv = s_wx[:]; wyv = s_wy[:]; wzv = s_wz[:]
            cqx = s_qx[:]; cqy = s_qy[:]; cqz = s_qz[:]; cqw = s_qw[:]
            mov_f = movable[:]
            if sleep:
                mov_f = mov_f * (1.0 - s_sleep[:])
            dqx = hq * (wxv * cqw + wyv * cqz - wzv * cqy)
            dqy = hq * (-wxv * cqz + wyv * cqw + wzv * cqx)
            dqz = hq * (wxv * cqy - wyv * cqx + wzv * cqw)
            dqw = hq * (-wxv * cqx - wyv * cqy - wzv * cqz)
            nqx = cqx + dqx * mov_f
            nqy = cqy + dqy * mov_f
            nqz = cqz + dqz * mov_f
            nqw = cqw + dqw * mov_f
            qn = jax.lax.rsqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw + 1e-12)
            s_qx[:] = nqx * qn; s_qy[:] = nqy * qn; s_qz[:] = nqz * qn; s_qw[:] = nqw * qn
      if sleep:
          # all-movable-bodies-asleep fast path: a fully settled launch
          # skips broadphase/narrowphase/solver/integration entirely
          pl.when(jnp.sum(movable[:] * (1.0 - s_sleep[:])) > 0.5)(_active_substep)
      else:
          _active_substep()
      return carry

    jax.lax.fori_loop(0, n_sub, body_substep, 0)
    o_posx[:] = s_px[:]; o_posy[:] = s_py[:]; o_posz[:] = s_pz[:]
    o_velx[:] = s_vx[:]; o_vely[:] = s_vy[:]; o_velz[:] = s_vz[:]
    o_avx[:] = s_wx[:]; o_avy[:] = s_wy[:]; o_avz[:] = s_wz[:]
    o_qx[:] = s_qx[:]; o_qy[:] = s_qy[:]; o_qz[:] = s_qz[:]; o_qw[:] = s_qw[:]
    if sleep:
        o_sleep[:] = s_sleep[:]
        o_timer[:] = s_timer[:]
    else:
        o_sleep[:] = asleep0[:]
        o_timer[:] = timer0[:]


def _part1by1(x: Array) -> Array:
    """Spread the low 16 bits of x so there is a zero bit between each."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_rank_key(ps: PhysicsState, exclude: Array | None = None) -> Array:
    """Sort key: inactive (and excluded hub) bodies last, others by Morton(x, z)
    cell (vertical columns stay rank-adjacent under y-gravity — the
    banding-friendly order)."""
    lo = jnp.min(ps.pos, axis=0)
    hi = jnp.max(ps.pos, axis=0)
    span = jnp.maximum(hi - lo, 1e-3)
    qx = jnp.clip(((ps.pos[:, 0] - lo[0]) / span[0] * 1023.0), 0, 1023).astype(jnp.int32)
    qz = jnp.clip(((ps.pos[:, 2] - lo[2]) / span[2] * 1023.0), 0, 1023).astype(jnp.int32)
    morton = _part1by1(qx) | (_part1by1(qz) << 1)
    last = ~ps.active if exclude is None else (~ps.active) | exclude
    return morton + last.astype(jnp.int32) * (1 << 22)


def slab_rank_key(ps: PhysicsState, exclude: Array | None = None) -> Array:
    """x-slab-major, z-minor sort key (f32). Lateral neighbors then sit within
    ~2 slab populations of rank distance — a hard bound Morton cannot give (its
    quadrant seams jump arbitrarily far; measured worst 519 vs 136 on the
    flagship pile). Slab width ≈ 1.1 body diameters: bodies cannot pack tighter
    laterally, so each slab holds ≈ one body column per z cell."""
    act = ps.active if exclude is None else ps.active & ~exclude
    actf = act.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(actf), 1.0)
    eff_half = jnp.maximum(jnp.max(ps.half_extent, axis=1), ps.radius)
    cell = 2.2 * jnp.sum(eff_half * actf) / n  # ≈ 1.1 × mean diameter
    cell = jnp.maximum(cell, 1e-3)
    big = jnp.float32(3e9)
    lo_x = jnp.min(jnp.where(act, ps.pos[:, 0], big))
    lo_z = jnp.min(jnp.where(act, ps.pos[:, 2], big))
    hi_z = jnp.max(jnp.where(act, ps.pos[:, 2], -big))
    qx = jnp.floor((ps.pos[:, 0] - lo_x) / cell)
    zn = (ps.pos[:, 2] - lo_z) / jnp.maximum(hi_z - lo_z, 1e-3)
    key = qx + jnp.clip(zn, 0.0, 0.999)
    return jnp.where(act, key, big)


def band_coverage_report(ps: PhysicsState, margin: float = 0.1, band: int | None = None) -> dict:
    """Debug diagnostic: how well does the ±BAND rank window cover the actual
    AABB-overlap pair set for this scene shape? Dense O(B²) — offline use only
    (bench/tuning scripts, tests), not for the hot path.

    Returns {"pairs": in-overlap pair count, "outside_band": pairs the band mask
    would reject this launch, "max_rank_dist": worst pair rank distance}.
    """
    _, is_hub = extract_hub_planes(ps)
    key = slab_rank_key(ps, exclude=is_hub)
    rank = jnp.argsort(jnp.argsort(key))
    eff = jnp.maximum(jnp.max(ps.half_extent, axis=1), ps.radius) + margin
    lo = ps.pos - eff[:, None]
    hi = ps.pos + eff[:, None]
    overlap = jnp.all(
        (lo[:, None, :] <= hi[None, :, :]) & (hi[:, None, :] >= lo[None, :, :]), axis=-1
    )
    act = ps.active & ~is_hub
    valid = act[:, None] & act[None, :] & (rank[:, None] < rank[None, :])
    pair = overlap & valid
    dist = jnp.abs(rank[:, None] - rank[None, :])
    n_pairs = int(jnp.sum(pair))
    outside = int(jnp.sum(pair & (dist > (BAND if band is None else band))))
    max_dist = int(jnp.max(jnp.where(pair, dist, 0)))
    return {"pairs": n_pairs, "outside_band": outside, "max_rank_dist": max_dist}


HUB_MIN_FACE_AREA = 25.0  # m²: static boxes with a larger face become analytic planes


def extract_hub_planes(ps: PhysicsState) -> tuple[Array, Array]:
    """Find up to N_PLANE large static boxes and describe them as bounded planes.

    Returns (plane_scalars (N_PLANE*PLANE_SC,), is_hub (B,) bool). Each plane row is
    [center(3), n(3), u(3), v(3), half_u, half_v, half_thickness, friction] with
    half_u = -1 marking an unused slot. Large statics must leave the banded pair
    phase: a single rank cannot be within ±BAND of every body it touches (the
    falling-through-the-floor failure mode).
    """
    he = ps.half_extent
    sorted_ext = jnp.sort(he, axis=1)  # ascending
    face_area = 4.0 * sorted_ext[:, 1] * sorted_ext[:, 2]
    hub_score = jnp.where(
        (ps.body_type == BODY_STATIC) & (ps.shape_type == SHAPE_BOX) & ps.active,
        face_area,
        -1.0,
    )
    vals, hub_idx = jax.lax.top_k(hub_score, N_PLANE)
    hub_ok = vals > HUB_MIN_FACE_AREA
    is_hub = jnp.zeros(ps.num_slots, bool).at[hub_idx].set(hub_ok)

    rows = []
    for p in range(N_PLANE):
        i = hub_idx[p]
        x, y, z, w = ps.quat[i, 0], ps.quat[i, 1], ps.quat[i, 2], ps.quat[i, 3]
        r = jnp.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        h = he[i]
        order = jnp.argsort(h)  # thin axis first → plane normal
        n_ax = r[:, order[0]]
        u_ax = r[:, order[1]]
        v_ax = r[:, order[2]]
        hu = jnp.where(hub_ok[p], h[order[1]], -1.0)
        rows.append(
            jnp.concatenate(
                [
                    ps.pos[i], n_ax, u_ax, v_ax,
                    jnp.stack([hu, h[order[2]], h[order[0]], ps.friction[i]]),
                ]
            )
        )
    return jnp.concatenate(rows), is_hub


_PERMUTED_FIELDS = (
    "pos", "prev_pos", "linvel", "angvel", "quat", "prev_quat",
    "inv_mass", "inv_inertia", "half_extent", "radius", "radius2", "half_length",
    "friction", "restitution", "gravity_factor", "dof_mask_lin",
    "body_type", "shape_type", "active", "entity", "is_character",
    "ground_normal_y", "asleep", "sleep_timer",
)


def _permute_state(ps: PhysicsState, perm: Array) -> PhysicsState:
    updates = {}
    for f in _PERMUTED_FIELDS:
        v = getattr(ps, f, None)
        if v is not None:
            updates[f] = v[perm]
    return dataclasses.replace(ps, **updates)


@partial(
    jax.jit,
    static_argnames=("iterations", "n_substeps", "interpret", "warm", "geom_every", "sleep"),
)
def megakernel_substeps_banded(
    ps: PhysicsState,
    params: PhysicsParams,
    dt,
    n_substeps: int = 1,
    iterations: int = 10,
    interpret: bool = False,
    warm: float = 0.0,
    geom_every: int = 1,
    sleep: bool = False,
) -> PhysicsState:
    """Banded throughput path: Morton-sort ranks once per launch, run the banded +
    geometry-hoisted kernel for `n_substeps`, permute results back to slot order."""
    b = ps.num_slots
    assert b % BCHUNK == 0 and b >= SLAB, (
        f"banded kernel needs capacity a multiple of {BCHUNK} and >= {SLAB}"
    )
    assert not ps.has_proxies, (
        "compound bodies are not supported on the mega-kernel throughput path yet; "
        "use the XLA physics_substep path"
    )

    plane_block, is_hub = extract_hub_planes(ps)
    key = slab_rank_key(ps, exclude=is_hub)
    iota = jnp.arange(b, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    sorted_ps = _permute_state(ps, perm)
    hub_sorted = is_hub[perm]

    dyn = ((sorted_ps.body_type == BODY_DYNAMIC) & sorted_ps.active).astype(jnp.float32)
    movable = ((sorted_ps.body_type != BODY_STATIC) & sorted_ps.active).astype(jnp.float32)
    is_box = (sorted_ps.shape_type == SHAPE_BOX).astype(jnp.float32)
    # hub bodies are served by the analytic planes — exclude from the pair phase
    act_pair = sorted_ps.active.astype(jnp.float32) * (1.0 - hub_sorted.astype(jnp.float32))

    scalars = jnp.concatenate(
        [
            jnp.stack(
                [
                    jnp.asarray(dt, jnp.float32),
                    params.gravity[0],
                    params.gravity[1],
                    params.gravity[2],
                    params.baumgarte,
                    params.penetration_slop,
                    # AABB margin: scaled by the geometry stride so pairs that
                    # will first touch between SAT rebuilds are already candidates
                    jnp.asarray(0.04 * geom_every, jnp.float32),
                    jnp.asarray(float(n_substeps), jnp.float32),
                ]
            ),
            plane_block.astype(jnp.float32),
            jnp.stack(
                [params.sleep_velocity**2, params.sleep_time]
            ).astype(jnp.float32),
        ]
    )

    sp = sorted_ps
    r1 = lambda x: x.reshape(1, b)
    inputs = [
        r1(sp.pos[:, 0]), r1(sp.pos[:, 1]), r1(sp.pos[:, 2]),
        r1(sp.linvel[:, 0]), r1(sp.linvel[:, 1]), r1(sp.linvel[:, 2]),
        r1(sp.angvel[:, 0]), r1(sp.angvel[:, 1]), r1(sp.angvel[:, 2]),
        r1(sp.quat[:, 0]), r1(sp.quat[:, 1]), r1(sp.quat[:, 2]), r1(sp.quat[:, 3]),
        r1(sp.inv_mass),
        r1(sp.inv_inertia[:, 0]), r1(sp.inv_inertia[:, 1]), r1(sp.inv_inertia[:, 2]),
        r1(sp.half_extent[:, 0]), r1(sp.half_extent[:, 1]), r1(sp.half_extent[:, 2]),
        r1(sp.radius), r1(sp.half_length),
        r1(sp.friction), r1(sp.restitution), r1(sp.gravity_factor),
        r1(sp.dof_mask_lin[:, 0]), r1(sp.dof_mask_lin[:, 1]), r1(sp.dof_mask_lin[:, 2]),
        r1(is_box), r1(dyn), r1(movable), r1(act_pair),
    ]
    # sleeping inputs (always passed; inert when sleep=False)
    r_eff = jnp.maximum(jnp.max(sp.half_extent, axis=1), sp.radius + sp.half_length)
    can_sleep = dyn * (1.0 - sp.is_character.astype(jnp.float32))
    inputs += [
        r1(sp.asleep.astype(jnp.float32)), r1(sp.sleep_timer),
        r1(r_eff * r_eff), r1(can_sleep),
    ]

    out_shapes = [jax.ShapeDtypeStruct((1, b), jnp.float32)] * 15
    n_d0 = N_SLOT if geom_every > 1 else 0
    n_lam = N_WARM if warm > 0.0 else 0
    n_small = N_SMALL + (N_PWARM if warm > 0.0 else 0) + (3 if geom_every > 1 else 0)
    n_sleep = 4 if sleep else 0
    outs = pl.pallas_call(
        partial(
            _banded_kernel,
            iterations=iterations, n_bodies=b, warm=warm, geom_every=geom_every,
            sleep=sleep,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((b, SLAB), jnp.float32)] * (N_GEOM + n_d0)
        + [pltpu.VMEM((b, SLAB), LAM_DT)] * n_lam
        + [pltpu.VMEM((1, b), jnp.float32)] * (n_small + n_sleep),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, *inputs)

    (npx, npy, npz, nvx, nvy, nvz, nwx, nwy, nwz, nqx, nqy, nqz, nqw, nsl, ntm) = [
        o.reshape(b) for o in outs
    ]
    # map results back to original slot order
    inv = jnp.zeros(b, jnp.int32).at[perm].set(iota)
    take = lambda x: x[inv]
    return dataclasses.replace(
        ps,
        prev_pos=ps.pos,
        prev_quat=ps.quat,
        pos=take(jnp.stack([npx, npy, npz], axis=-1)),
        linvel=take(jnp.stack([nvx, nvy, nvz], axis=-1)),
        angvel=take(jnp.stack([nwx, nwy, nwz], axis=-1)),
        quat=take(jnp.stack([nqx, nqy, nqz, nqw], axis=-1)),
        asleep=take(nsl > 0.5),
        sleep_timer=take(ntm),
    )


def count_hub_planes(ps: PhysicsState) -> int:
    """Host-side count of the hub planes extract_hub_planes would emit (≤ N_PLANE)
    — lets callers size the compact kernel's plane-contact pages to the scene
    (`megakernel_substeps_compact(n_planes=...)`). Numpy: runs at bench/scene
    setup, not in the hot path."""
    import numpy as np

    he = np.asarray(ps.half_extent)
    ext = np.sort(he, axis=1)
    area = 4.0 * ext[:, 1] * ext[:, 2]
    is_hub = (
        (np.asarray(ps.body_type) == BODY_STATIC)
        & (np.asarray(ps.shape_type) == SHAPE_BOX)
        & np.asarray(ps.active)
        & (area > HUB_MIN_FACE_AREA)
    )
    return max(1, min(int(is_hub.sum()), N_PLANE))
