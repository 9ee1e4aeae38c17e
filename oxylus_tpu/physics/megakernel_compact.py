"""Vectorized compacted-neighbor physics mega-kernel (throughput path, round 2).

Evolution of the scalar compact kernel: identical discovery/solver semantics,
but ALL per-pair work (SAT manifolds, effective masses, warm-started solver
sweeps, lambda remap) runs on full (R, B) = 16 x B arrays instead of R separate
(1, B) sublane slices — 8x the VPU sublane utilization per op and ~16x fewer
issued instructions in the hot sections.

Data movement between body order and neighbor-slot order:
  - gathers ride ONE (2n, SLAB) @ (SLAB, R*BCHUNK) MXU matmul per chunk
    (hi rows stacked above lo rows — halves matmul count vs separate hi/lo),
    results page-stored into a 3D field-major scratch g3[(field, R, B)]
  - scatters stay per (r, chunk): (2n, BCHUNK) @ (BCHUNK, SLAB) with the same
    hi/lo row stacking, staged through 3D (2n, R, B) bf16 pages
  - f32 operands ride the MXU as hi/lo bf16 pairs (exact to ~2^-16 relative)

Semantics (approximation contract, combine rules, sleeping, plane hubs) match
`megakernel_banded._banded_kernel`; see that module's docstring.  Reference
behavior reproduced: Jolt's PhysicsSystem::Update as configured by
`/root/reference/Oxylus/src/Physics/Physics.cpp:100-115` (broadphase ->
narrowphase -> impulse solver at fixed 60 Hz, `Scene.cpp:720-729`).

Because neighbor-slot assignment changes at every SAT rebuild, the per-slot
lambda caches are REMAPPED at rebuild time by matching old/new partner deltas
(vectorized: (R, BCHUNK) match matrix per new slot, sublane-reduced, rowmask-
accumulated) — without this the warm pass replays an impulse onto the wrong
pair and resting stacks explode.

Only the warm-started solver path is implemented (warm > 0); the production
config has used warm=0.7 since round 1 (PERF_NOTES.md).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel_banded import extract_hub_planes, slab_rank_key, _permute_state
from .state import BODY_DYNAMIC, BODY_STATIC, PhysicsParams, PhysicsState

Array = jax.Array

BCHUNK = 128          # rows per discovery chunk
BAND = 128            # max rank_b - rank_a for a candidate pair
SLAB = BCHUNK + BAND  # discovery slab / gather window width
R = 16                # compacted neighbor slots per body (lower-rank side)
N_SLOT = 4            # manifold points per pair
LAM_DT = jnp.bfloat16
N_PLANE = 4
PLANE_SC = 16

# per-pair (R, B) f32 geometry caches:
#   nx ny nz mu  dx0 dy0 dz0  dxc dyc dzc  + per slot [rax ray raz ikn bias d0]
N_PGEO = 10 + 6 * N_SLOT
N_LAM = N_SLOT + 3    # per-slot normal lambdas + one pair tangent vector (bf16)
N_SMALL = 32 + 2      # body rows + paircnt + ovf
NPK = N_PLANE * N_SLOT  # plane-contact rows: (NPK, b) stacked (plane, slot)
N_PGEO_P = 9          # plane geo pages: rax ray raz ikn bias nx ny nz mu
N_PLAM = 4            # plane lambda pages: ln ltx lty ltz (f32)
GROWS = 32            # gathered col-state pages (field-major)
GSTG = 32             # gather staging rows (hi above lo; max 16 fields/phase)
SSTG = 12             # scatter staging pages (hi above lo; max 6 rows/phase)
SLEEP_EVERY = 4       # sleep bookkeeping cadence in substeps (15 Hz)


def _ws(c: int, b: int) -> int:
    return max(0, min(c * BCHUNK, b - SLAB))


def _compact_kernel(
    scalars_ref,
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
    o_sleep, o_timer, o_ovf,
    *scratch,
    iterations: int,
    n_bodies: int,
    warm: float = 0.7,
    geom_every: int = 2,
    sleep: bool = False,
    resident_m: bool = True,
    band: int = BAND,
    r_slots: int = R,
    n_planes: int = N_PLANE,
    ablate: tuple = (),  # DEBUG ONLY: skip named phases for timing attribution
):
    # shadow the module constants: every use below binds to these locals, so a
    # launch can widen the rank band (scenes whose slab population exceeds 128,
    # e.g. the single-pile flagship at rest) or narrow the neighbor-slot count
    # (10k-body capacity mode: R=8 halves the (R, b) scratch AND the SAT's
    # live-temporary footprint — the 10240-body compile was VMEM-bound on
    # register-allocator spill slots, not on FLOPs)
    R = r_slots            # noqa: F841 — intentional shadow
    BAND = band            # noqa: F841
    SLAB = BCHUNK + band   # noqa: F841
    NPK = n_planes * N_SLOT  # noqa: F841 — plane pages sized to the live count

    dt = scalars_ref[0]
    g = (scalars_ref[1], scalars_ref[2], scalars_ref[3])
    baumgarte = scalars_ref[4]
    slop = scalars_ref[5]
    margin = scalars_ref[6]
    n_sub = scalars_ref[7].astype(jnp.int32)
    sleep_v2 = scalars_ref[8 + N_PLANE * PLANE_SC]
    sleep_time = scalars_ref[8 + N_PLANE * PLANE_SC + 1]

    b = n_bodies
    nc = b // BCHUNK
    f32 = jnp.float32

    # ---- unpack scratch ------------------------------------------------------
    it = iter(scratch)
    d_cur = next(it)            # (R, b) i32 partner deltas (0 = empty slot)
    d_new = next(it)            # (R, b) i32 rebuild staging (remap needs both)
    if resident_m:
        m_ref = next(it)        # (nc*SLAB, R*BCHUNK) bf16 gather/scatter one-hots
    else:
        # large-capacity mode (10k bodies): the resident one-hots cost 16 KB of
        # VMEM per body (the round-2 ~2k-body ceiling) — instead each chunk's
        # gather/scatter one-hot block is rebuilt on the fly from d_cur at its
        # use site (~R broadcast-compares per chunk, VPU-cheap)
        m_ref = None
    tri_ref = next(it)          # (SLAB, SLAB) bf16 strict-lower prefix matmul
    g3 = next(it)               # (GROWS, R, b) f32 gathered col-state pages
    s_ghl = next(it)            # (GSTG, b) bf16 gather source (hi rows, lo rows)
    sc_hl = next(it)            # (SSTG, R*b) bf16 scatter staging (slot-major lanes)
    acc8 = next(it)             # (8, b) f32 scatter accumulator
    pgeo = [next(it) for _ in range(N_PGEO)]   # (R, b) f32 geometry caches
    lam = [next(it) for _ in range(N_LAM)]     # (R, b) bf16 lambda caches
    pgeo_p = [next(it) for _ in range(N_PGEO_P)]  # (NPK, b) f32 plane geo pages
    plam = [next(it) for _ in range(N_PLAM)]   # (NPK, b) f32 plane lambda pages
    small = [next(it) for _ in range(N_SMALL)]
    if sleep:
        s_sleep, s_timer, s_pusher, s_awakef = (next(it) for _ in range(4))
    assert not list(it)

    (g_nx, g_ny, g_nz, g_mu,
     g_dx0, g_dy0, g_dz0,
     g_dxc, g_dyc, g_dzc) = pgeo[:10]
    g_ra = [pgeo[10 + 6 * k : 10 + 6 * (k + 1)] for k in range(N_SLOT)]
    g_lam = lam[:N_SLOT]
    g_lamt = lam[N_SLOT : N_SLOT + 3]
    p_rax, p_ray, p_raz, p_ikn, p_bias, p_nx, p_ny, p_nz, p_mu = pgeo_p
    pl_n, pl_tx, pl_ty, pl_tz = plam
    (
        s_px, s_py, s_pz, s_vx, s_vy, s_vz, s_wx, s_wy, s_wz,
        s_qx, s_qy, s_qz, s_qw,
        s_r00, s_r01, s_r02, s_r10, s_r11, s_r12, s_r20, s_r21, s_r22,
        s_ehx, s_ehy, s_ehz,
        s_cax, s_cay, s_caz,
        s_ime, s_imex, s_imey, s_imez,
    ) = small[:32]
    s_paircnt = small[32]
    s_ovf = small[33]

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

    # ---- stage state ---------------------------------------------------------
    s_px[:] = posx[:]; s_py[:] = posy[:]; s_pz[:] = posz[:]
    s_vx[:] = velx[:]; s_vy[:] = vely[:]; s_vz[:] = velz[:]
    s_wx[:] = avx[:]; s_wy[:] = avy[:]; s_wz[:] = avz[:]
    s_qx[:] = qx[:]; s_qy[:] = qy[:]; s_qz[:] = qz[:]; s_qw[:] = qw[:]
    d_cur[:, :] = jnp.zeros((R, b), jnp.int32)
    s_ovf[:] = jnp.zeros((1, b), f32)
    for ref in lam:
        ref[:, :] = jnp.zeros((R, b), LAM_DT)
    for ref in plam:
        ref[:, :] = jnp.zeros((NPK, b), f32)
    if sleep:
        s_sleep[:] = asleep0[:]
        s_timer[:] = timer0[:]
        s_awakef[:] = 1.0 - asleep0[:]
    # strict-lower prefix matrix: tri[j', j] = 1 iff j' < j (exclusive prefix
    # sum along lanes = one MXU matmul)
    jj0 = jax.lax.broadcasted_iota(jnp.int32, (SLAB, SLAB), 0)
    jj1 = jax.lax.broadcasted_iota(jnp.int32, (SLAB, SLAB), 1)
    tri_ref[:, :] = (jj0 < jj1).astype(jnp.bfloat16)

    # ---- chunk iteration ------------------------------------------------------
    # Resident path (b <= 4096): Python-unrolled chunks with STATIC slice offsets
    # (best MXU scheduling). Large-capacity path (10k bodies): the same bodies run
    # under ONE lax.fori_loop with dynamic 128-aligned lane slices — unrolling 80
    # chunks exploded the register allocator (241 MB VMEM: 180 MB of spill slots
    # at b=10240), while dynamic-trip loops pipeline fine (PERF_NOTES Mosaic
    # table; alignment probe: scripts/probe_dynslice.py).
    def ws_of(c):
        if resident_m:
            return max(0, min(c * BCHUNK, b - SLAB))  # python int → static slices
        return pl.multiple_of(
            jnp.maximum(0, jnp.minimum(c * BCHUNK, b - SLAB)), 128
        )

    def cs_of(c):
        if resident_m:
            return c * BCHUNK
        return pl.multiple_of(c * BCHUNK, 128)

    def chunk_loop(body):
        if resident_m:
            for c in range(nc):
                body(c)
        else:
            def _it(c, _):
                body(c)
                return 0
            jax.lax.fori_loop(0, nc, _it, 0)

    def rowT(ref, start):
        return jnp.swapaxes(ref[0:1, pl.ds(start, BCHUNK)], 0, 1)

    def colS(ref, cs):
        return ref[0:1, pl.ds(cs, SLAB)]

    # ---- one-hot matmul gather / scatter helpers -----------------------------
    def m_block(c):
        """Chunk c's (SLAB, R*BCHUNK) gather one-hot, built from d_cur."""
        ws = ws_of(c)
        off = cs_of(c) - ws
        li = jax.lax.broadcasted_iota(jnp.int32, (1, BCHUNK), 1)
        jjm = jax.lax.broadcasted_iota(jnp.int32, (SLAB, BCHUNK), 0)
        parts = []
        for r in range(R):
            dr = d_cur[r : r + 1, pl.ds(cs_of(c), BCHUNK)]
            parts.append((jjm == li + off + dr).astype(jnp.bfloat16))
        return jnp.concatenate(parts, axis=1)

    def gather_phase(fields, row0):
        """Gather partner values of `fields` ((1,b) f32 values) into g3 pages
        [row0 .. row0+n); one Mbig matmul per chunk, hi/lo rows stacked."""
        n = len(fields)
        for k, v in enumerate(fields):
            hi = v.astype(jnp.bfloat16)
            s_ghl[k : k + 1, :] = hi
            s_ghl[n + k : n + k + 1, :] = (v - hi.astype(f32)).astype(jnp.bfloat16)

        def gather_chunk(c):
            ws = ws_of(c)
            mm = jnp.dot(
                s_ghl[0 : 2 * n, pl.ds(ws, SLAB)],
                m_ref[c * SLAB : (c + 1) * SLAB, :] if resident_m else m_block(c),
                preferred_element_type=f32,
            )  # (2n, R*BCHUNK)
            for r in range(R):
                gm = (
                    mm[0:n, r * BCHUNK : (r + 1) * BCHUNK]
                    + mm[n : 2 * n, r * BCHUNK : (r + 1) * BCHUNK]
                )
                g3[row0 : row0 + n, r, pl.ds(cs_of(c), BCHUNK)] = gm

        chunk_loop(gather_chunk)

    def stage_scatter_pages(rows):
        """Stage (R, b) f32 values as hi/lo bf16 rows of the 2D (SSTG, R*b)
        staging ref (slot-major columns: slot r occupies lanes [r*b, (r+1)*b)).
        Values MUST be exactly zero at empty slots (d_cur == 0): the scatter
        reuses the GATHER one-hot, whose empty-slot column targets self."""
        n = len(rows)
        for k, v in enumerate(rows):
            for r in range(R):
                vr = v[r : r + 1, :]
                hi = vr.astype(jnp.bfloat16)
                sc_hl[k : k + 1, pl.ds(r * b, b)] = hi
                sc_hl[n + k : n + k + 1, pl.ds(r * b, b)] = (
                    vr - hi.astype(f32)
                ).astype(jnp.bfloat16)

    def scatter_phase(nrows):
        """Scatter-add staged pages into acc8[0:nrows].

        Scatter is the exact transpose of gather, so each chunk rides ONE
        rhs-transposed MXU matmul against the SAME one-hot block the gathers
        use: (2n, R*BCHUNK) · (SLAB, R*BCHUNK)^T -> (2n, SLAB). This replaced
        R separate (2n, BCHUNK)·(BCHUNK, SLAB) matmuls (M=12 wastes ~90% of
        the systolic rows; measured ~580 us of 1855 us/substep at 10k bodies,
        scripts/scan_10k.py) and retired the dedicated mt_ref one-hots."""
        acc8[0:nrows, :] = jnp.zeros((nrows, b), f32)

        def scatter_chunk(c):
            ws = ws_of(c)
            vals = jnp.concatenate(
                [sc_hl[0 : 2 * nrows, pl.ds(r * b + cs_of(c), BCHUNK)] for r in range(R)],
                axis=1,
            )  # (2n, R*BCHUNK)
            mm = jax.lax.dot_general(
                vals,
                m_ref[c * SLAB : (c + 1) * SLAB, :] if resident_m else m_block(c),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (2n, SLAB)
            acc8[0:nrows, pl.ds(ws, SLAB)] = (
                acc8[0:nrows, pl.ds(ws, SLAB)] + mm[0:nrows] + mm[nrows : 2 * nrows]
            )

        chunk_loop(scatter_chunk)

    def body_substep(step_i, carry):
      def _active_substep():
            # --- integrate velocities (gravity; dynamics only) ----------------
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

            # ========== rebuild: discovery -> compact -> M/MT -> SAT ==========
            def rebuild_pairs():
                # --- banded discovery + per-row compaction to delta slots ------
                # row-side counts/overflow write straight to their (1, b) pages;
                # col-side counts ACCUMULATE into acc8 row 0 (windows of adjacent
                # chunks overlap by BAND, so this must be sequential
                # read-modify-write — which both chunk_loop modes are)
                rows_ch = jax.lax.broadcasted_iota(jnp.int32, (R, BCHUNK), 0)
                acc8[0:1, :] = jnp.zeros((1, b), jnp.float32)

                def discover_chunk(c):
                    start = cs_of(c)
                    cs = ws_of(c)
                    dxc = colS(s_px, cs) - rowT(s_px, start)
                    dyc = colS(s_py, cs) - rowT(s_py, start)
                    dzc = colS(s_pz, cs) - rowT(s_pz, start)
                    overlap = (
                        (jnp.abs(dxc) <= rowT(s_ehx, start) + colS(s_ehx, cs))
                        & (jnp.abs(dyc) <= rowT(s_ehy, start) + colS(s_ehy, cs))
                        & (jnp.abs(dzc) <= rowT(s_ehz, start) + colS(s_ehz, cs))
                    )
                    some_dyn = (rowT(dynamic, start) + colS(dynamic, cs)) > 0.5
                    both_act = (rowT(act, start) * colS(act, cs)) > 0.5
                    a_ids = jax.lax.broadcasted_iota(jnp.int32, (BCHUNK, SLAB), 0) + start
                    b_ids = jax.lax.broadcasted_iota(jnp.int32, (BCHUNK, SLAB), 1) + cs
                    delta = b_ids - a_ids
                    in_band = (delta >= 1) & (delta <= BAND) & (b_ids < b)
                    active = overlap & some_dyn & both_act & in_band
                    af = active.astype(jnp.float32)

                    pref = jnp.dot(
                        af.astype(jnp.bfloat16), tri_ref[:, :],
                        preferred_element_type=jnp.float32,
                    )
                    kept = af * (pref < float(R)).astype(jnp.float32)
                    ndc = jnp.zeros((R, BCHUNK), jnp.int32)
                    for r in range(R):
                        sel = kept * (jnp.abs(pref - float(r)) < 0.5).astype(jnp.float32)
                        dr = jnp.sum(delta.astype(jnp.float32) * sel, axis=1, keepdims=True)
                        drT = jnp.swapaxes(dr, 0, 1).astype(jnp.int32)  # (1, BCHUNK)
                        ndc = jnp.where(rows_ch == r, drT, ndc)
                    d_new[:, pl.ds(start, BCHUNK)] = ndc

                    s_paircnt[0:1, pl.ds(start, BCHUNK)] = jnp.swapaxes(
                        jnp.sum(kept, axis=1, keepdims=True), 0, 1
                    )
                    s_ovf[0:1, pl.ds(start, BCHUNK)] = jnp.swapaxes(
                        jnp.sum(af - kept, axis=1, keepdims=True), 0, 1
                    )
                    cpart = jnp.sum(kept, axis=0, keepdims=True)
                    acc8[0:1, pl.ds(cs, SLAB)] = acc8[0:1, pl.ds(cs, SLAB)] + cpart

                chunk_loop(discover_chunk)
                s_paircnt[:] = s_paircnt[:] + acc8[0:1, :]

                # --- remap lambda caches old slots -> new slots -----------------
                # match on partner delta; unmatched new slots start cold at 0.
                # vectorized: per new slot rn, an (R, BCHUNK) match matrix against
                # ALL old slots at once, sublane-reduced, rowmask-accumulated.
                def remap_chunk(c):
                    sl = pl.ds(cs_of(c), BCHUNK)
                    d_old = d_cur[:, sl]                       # (R, BCHUNK)
                    lam_old = [a[:, sl].astype(jnp.float32) for a in lam]
                    lam_new = [jnp.zeros((R, BCHUNK), jnp.float32) for _ in lam]
                    for rn in range(R):
                        dn = d_new[rn : rn + 1, sl]            # (1, BCHUNK) ref row
                        match = ((d_old == dn) & (dn > 0)).astype(jnp.float32)
                        for a in range(len(lam)):
                            red = jnp.sum(lam_old[a] * match, axis=0, keepdims=True)
                            lam_new[a] = jnp.where(rows_ch == rn, red, lam_new[a])
                    for a in range(len(lam)):
                        lam[a][:, sl] = lam_new[a].astype(LAM_DT)

                chunk_loop(remap_chunk)
                d_cur[:, :] = d_new[:, :]

                # --- build M (Mbig layout) one-hot blocks -----------------------
                # (resident mode only; large-capacity mode rebuilds per use)
                # gathers AND scatters both ride this block now (scatter
                # contracts its transpose via rhs-transposed dot_general)
                # NOTE: must use ws_of() (band-shadowed SLAB), not module _ws()
                # (module SLAB=256): with band>128 the tail-chunk windows differ
                # by up to band-128 and the one-hot would mismatch the gather
                # windows (silently wrong partner state — round-4 advisor fix).
                for r in range(R if resident_m else 0):
                    for c in range(nc):
                        ws = ws_of(c)
                        off = c * BCHUNK - ws
                        dr = d_cur[r : r + 1, c * BCHUNK : (c + 1) * BCHUNK]
                        li = jax.lax.broadcasted_iota(jnp.int32, (1, BCHUNK), 1)
                        tgt = li + off + dr
                        jjm = jax.lax.broadcasted_iota(jnp.int32, (SLAB, BCHUNK), 0)
                        m_ref[c * SLAB : (c + 1) * SLAB,
                              r * BCHUNK : (r + 1) * BCHUNK] = (jjm == tgt).astype(jnp.bfloat16)

                # --- gather col-side geometry (pages 0..15, 16..20) -------------
                gather_phase(
                    [s_r00[:], s_r01[:], s_r02[:], s_r10[:], s_r11[:], s_r12[:],
                     s_r20[:], s_r21[:], s_r22[:],
                     hx[:], hy[:], hz[:], rad[:],
                     s_cax[:], s_cay[:], s_caz[:]],
                    0,
                )
                gather_phase(
                    [s_px[:], s_py[:], s_pz[:], fric[:], is_box[:]],
                    16,
                )

                # --- SAT manifolds over neighbor-slot row blocks ----------------
                # Row-blocking bounds the register allocator's live set: the SAT
                # holds ~100 live (rows, b) f32 temporaries, and at b=10112 the
                # full-R block spilled 74 MB of VMEM (the 10k-body compile
                # failed at 128.38M/128.00M). Resident mode keeps one full-R
                # block (identical code to round 2); large-capacity mode runs
                # R in blocks of 4 rows — same math per row, ~3x smaller spill
                # region, bit-identical results (all ops are row-elementwise).
                def sat_rows(rs, rbn):
                    pair_valid = d_cur[rs, :] > 0                     # (R, b)
                    dxc = g3[16, rs, :] - s_px[:]
                    dyc = g3[17, rs, :] - s_py[:]
                    dzc = g3[18, rs, :] - s_pz[:]
                    g_dx0[rs, :] = dxc; g_dy0[rs, :] = dyc; g_dz0[rs, :] = dzc
                    g_dxc[rs, :] = dxc; g_dyc[rs, :] = dyc; g_dzc[rs, :] = dzc
                    g_mu[rs, :] = jnp.sqrt(fric[:] * g3[19, rs, :])

                    r_box = is_box[:]                                # (1, b)
                    c_box = g3[20, rs, :]                                   # (R, b)
                    both_round = (r_box < 0.5) & (c_box < 0.5)
                    a_box = r_box > 0.5
                    b_box = c_box > 0.5
                    r_rad = rad[:]; c_rad = g3[12, rs, :]
                    r_hx = hx[:]; r_hy = hy[:]; r_hz = hz[:]
                    c_hx = g3[9, rs, :]; c_hy = g3[10, rs, :]; c_hz = g3[11, rs, :]
                    rr = [
                        [s_r00[:], s_r01[:], s_r02[:]],
                        [s_r10[:], s_r11[:], s_r12[:]],
                        [s_r20[:], s_r21[:], s_r22[:]],
                    ]
                    cr = [
                        [g3[0, rs, :], g3[1, rs, :], g3[2, rs, :]],
                        [g3[3, rs, :], g3[4, rs, :], g3[5, rs, :]],
                        [g3[6, rs, :], g3[7, rs, :], g3[8, rs, :]],
                    ]

                    # capsule-capsule closest points
                    adx = s_cax[:]; ady = s_cay[:]; adz = s_caz[:]
                    bdx = g3[13, rs, :]; bdy = g3[14, rs, :]; bdz = g3[15, rs, :]
                    relx = dxc; rely = dyc; relz = dzc
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

                    # box(A)-capsule/sphere(B)
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

                    # capsule/sphere(A)-box(B)
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

                    # box-box SAT over the 6 face axes
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

                    best_depth = jnp.full((rbn, b), 1e30)
                    nbb_x = jnp.zeros((rbn, b)); nbb_y = jnp.zeros((rbn, b))
                    nbb_z = jnp.zeros((rbn, b))
                    ref_is_a = jnp.ones((rbn, b), jnp.float32)
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
                        one = jnp.ones_like(best_depth)
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
                        absd = [jnp.abs(dv) for dv in dots]
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

                    g_nx[rs, :] = nx
                    g_ny[rs, :] = ny
                    g_nz[rs, :] = nz
                    for k in range(N_SLOT):
                        rpx, rpy, rpz, depth = slots[k]
                        s_rax, s_ray, s_raz, _s_ikn, s_bias, s_d0 = g_ra[k]
                        s_rax[rs, :] = rpx
                        s_ray[rs, :] = rpy
                        s_raz[rs, :] = rpz
                        d0v = jnp.where(pair_valid, depth, -1e30)
                        s_d0[rs, :] = d0v
                        s_bias[rs, :] = jnp.where(
                            d0v > 0.0,
                            baumgarte / dt * jnp.maximum(d0v - slop, 0.0),
                            -1e30,
                        )

                if resident_m:
                    sat_rows(slice(0, R), R)
                else:
                    for _r0 in range(0, R, 4):
                        _rbn = min(4, R - _r0)
                        sat_rows(slice(_r0, _r0 + _rbn), _rbn)



            def refresh_pairs():
                # gather current partner positions -> fresh dxc + bias refresh
                gather_phase([s_px[:], s_py[:], s_pz[:]], 16)
                dxc = g3[16] - s_px[:]
                dyc = g3[17] - s_py[:]
                dzc = g3[18] - s_pz[:]
                # empty slots gather self -> dxc = 0; harmless (bias sentinel)
                ddx = dxc - g_dx0[:, :]
                ddy = dyc - g_dy0[:, :]
                ddz = dzc - g_dz0[:, :]
                g_dxc[:, :] = dxc
                g_dyc[:, :] = dyc
                g_dzc[:, :] = dzc
                nx = g_nx[:, :]; ny = g_ny[:, :]; nz = g_nz[:, :]
                drift = ddx * nx + ddy * ny + ddz * nz
                for k in range(N_SLOT):
                    _1, _2, _3, _4, s_bias, s_d0 = g_ra[k]
                    d = s_d0[:, :] - drift
                    s_bias[:, :] = jnp.where(
                        (d > 0.0) & (s_d0[:, :] > -1e29),
                        baumgarte / dt * jnp.maximum(d - slop, 0.0),
                        -1e30,
                    )

            if geom_every > 1:
                is_rebuild = (step_i % geom_every) == 0
                pl.when(is_rebuild)(rebuild_pairs)
                if "refresh" not in ablate:  # DEBUG ablation
                    pl.when(jnp.logical_not(is_rebuild))(refresh_pairs)
            else:
                rebuild_pairs()

            # --- analytic bounded planes (hub boxes), every substep -----------
            # all N_SLOT support points of a plane run as (N_SLOT, b) rows with
            # per-row su/sv sign constants; the NPK pages stack the N_PLANE
            # blocks: page row q = N_SLOT*p + k
            plane_cnt = jnp.zeros((1, b), jnp.float32)
            body_ax = [
                (s_r00[:], s_r10[:], s_r20[:], hx[:]),
                (s_r01[:], s_r11[:], s_r21[:], hy[:]),
                (s_r02[:], s_r12[:], s_r22[:], hz[:]),
            ]
            box_b = is_box[:] > 0.5
            dyn_b = dynamic[:] > 0.5
            caxv = s_cax[:]; cayv = s_cay[:]; cazv = s_caz[:]
            radv = rad[:]; hlenv = hlen[:]
            rows4 = jax.lax.broadcasted_iota(jnp.int32, (N_SLOT, b), 0)
            su4 = jnp.where(rows4 < 2, 1.0, -1.0)
            sv4 = jnp.where((rows4 % 2) == 0, 1.0, -1.0)
            cap_sgn = jnp.where(rows4 == 0, 1.0, jnp.where(rows4 == 1, -1.0, 0.0))
            use_box_pt = box_b | (rows4 >= 2)
            # float select: Mosaic rejects bool select_n against a literal
            shape_gate = jnp.where(
                rows4 >= 2, box_b.astype(jnp.float32),
                jnp.where(
                    rows4 == 1, (box_b | (hlenv > 1e-6)).astype(jnp.float32), 1.0
                ),
            ) > 0.5
            for p in (range(n_planes) if "planes" not in ablate else ()):
                P = plane_scalars(p)
                p_act = P["hu"] > 0.0
                dpx = s_px[:] - P["cx"]; dpy = s_py[:] - P["cy"]; dpz = s_pz[:] - P["cz"]
                side = P["nx"] * dpx + P["ny"] * dpy + P["nz"] * dpz
                sgn_p = jnp.where(side >= 0.0, 1.0, -1.0)
                nex = P["nx"] * sgn_p; ney = P["ny"] * sgn_p; nez = P["nz"] * sgn_p

                dots = [a[0] * nex + a[1] * ney + a[2] * nez for a in body_ax]
                absd = [jnp.abs(dv) for dv in dots]
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

                # box corner points per slot row, capsule endpoints on rows 0/1
                bx = fx + su4 * ufx + sv4 * vfx
                by = fy + su4 * ufy + sv4 * vfy
                bz = fz + su4 * ufz + sv4 * vfz
                rax = jnp.where(use_box_pt, bx, cap_sgn * caxv - nex * radv)
                ray = jnp.where(use_box_pt, by, cap_sgn * cayv - ney * radv)
                raz = jnp.where(use_box_pt, bz, cap_sgn * cazv - nez * radv)
                wx_c = dpx + rax; wy_c = dpy + ray; wz_c = dpz + raz
                hgt = nex * wx_c + ney * wy_c + nez * wz_c
                depth = P["ht"] - hgt
                pu = P["ux"] * wx_c + P["uy"] * wy_c + P["uz"] * wz_c
                pv = P["vx"] * wx_c + P["vy"] * wy_c + P["vz"] * wz_c
                inb = (jnp.abs(pu) <= P["hu"] + margin) & (jnp.abs(pv) <= P["hv"] + margin)
                touching = (
                    p_act & dyn_b & shape_gate & inb & (depth > 0.0) & (act[:] > 0.5)
                )
                sl4 = slice(N_SLOT * p, N_SLOT * (p + 1))
                p_rax[sl4, :] = rax; p_ray[sl4, :] = ray; p_raz[sl4, :] = raz
                p_bias[sl4, :] = jnp.where(
                    touching, baumgarte / dt * jnp.maximum(depth - slop, 0.0), -1e30
                )
                zero4 = jnp.zeros((N_SLOT, b), jnp.float32)
                p_nx[sl4, :] = nex + zero4
                p_ny[sl4, :] = ney + zero4
                p_nz[sl4, :] = nez + zero4
                p_mu[sl4, :] = jnp.sqrt(fric[:] * P["mu"]) + zero4
                plane_cnt = plane_cnt + jnp.sum(
                    touching.astype(jnp.float32), axis=0, keepdims=True
                )

            cnt = s_paircnt[:] + plane_cnt
            split = jnp.maximum(cnt, 1.0)
            # sleeping bodies keep their normal solver mass (see banded kernel
            # NOTE: infinite-mass gating explodes on wake)
            s_ime[:] = inv_mass[:] * split
            s_imex[:] = im3x[:] * split
            s_imey[:] = im3y[:] * split
            s_imez[:] = im3z[:] * split

            # --- pair effective masses (rebuild cadence), all slots at once ----
            def build_pair_ikn():
                gather_phase([s_ime[:], s_imex[:], s_imey[:], s_imez[:]], 22)
                nx = g_nx[:, :]; ny = g_ny[:, :]; nz = g_nz[:, :]
                dxc = g_dxc[:, :]; dyc = g_dyc[:, :]; dzc = g_dzc[:, :]
                c_ime = g3[22]; c_imex = g3[23]
                c_imey = g3[24]; c_imez = g3[25]
                for k in range(N_SLOT):
                    s_rax, s_ray, s_raz, s_ikn, _b, _d = g_ra[k]
                    rax = s_rax[:, :]; ray = s_ray[:, :]; raz = s_raz[:, :]
                    rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc
                    raxn_x = ray * nz - raz * ny
                    raxn_y = raz * nx - rax * nz
                    raxn_z = rax * ny - ray * nx
                    rbxn_x = rby * nz - rbz * ny
                    rbxn_y = rbz * nx - rbx * nz
                    rbxn_z = rbx * ny - rby * nx
                    ang_a = (
                        s_imex[:] * raxn_x**2
                        + s_imey[:] * raxn_y**2
                        + s_imez[:] * raxn_z**2
                    )
                    ang_b = (
                        c_imex * rbxn_x**2 + c_imey * rbxn_y**2 + c_imez * rbxn_z**2
                    )
                    kn = s_ime[:] + c_ime + ang_a + ang_b + 1e-9
                    s_ikn[:, :] = 1.0 / kn

            if geom_every > 1:
                pl.when((step_i % geom_every) == 0)(build_pair_ikn)
            else:
                build_pair_ikn()

            # --- plane effective masses (every substep, all NPK rows) ----------
            pnxv = p_nx[:, :]; pnyv = p_ny[:, :]; pnzv = p_nz[:, :]
            prxv = p_rax[:, :]; pryv = p_ray[:, :]; przv = p_raz[:, :]
            cxn = pryv * pnzv - przv * pnyv
            cyn = przv * pnxv - prxv * pnzv
            czn = prxv * pnyv - pryv * pnxv
            p_ikn[:, :] = 1.0 / (
                s_ime[:]
                + s_imex[:] * cxn**2 + s_imey[:] * cyn**2 + s_imez[:] * czn**2
                + 1e-9
            )

            # ============== solver sweeps over cached geometry =================
            def solve_iter(_, icarry, is_warm=False):
                if not is_warm and "sweep_gather" not in ablate:  # DEBUG ablation
                    gather_phase(
                        [s_vx[:], s_vy[:], s_vz[:], s_wx[:], s_wy[:], s_wz[:]], 26
                    )
                r_vx = s_vx[:]; r_vy = s_vy[:]; r_vz = s_vz[:]
                r_wx = s_wx[:]; r_wy = s_wy[:]; r_wz = s_wz[:]

                nx = g_nx[:, :]; ny = g_ny[:, :]; nz = g_nz[:, :]
                mu = g_mu[:, :]
                dxc = g_dxc[:, :]; dyc = g_dyc[:, :]; dzc = g_dzc[:, :]
                if not is_warm:
                    c_vx = g3[26]; c_vy = g3[27]; c_vz = g3[28]
                    c_wx = g3[29]; c_wy = g3[30]; c_wz = g3[31]

                jx_t = jnp.zeros((R, b), jnp.float32)
                jy_t = jnp.zeros((R, b), jnp.float32)
                jz_t = jnp.zeros((R, b), jnp.float32)
                ta_x = jnp.zeros((R, b), jnp.float32)
                ta_y = jnp.zeros((R, b), jnp.float32)
                ta_z = jnp.zeros((R, b), jnp.float32)
                tb_x = jnp.zeros((R, b), jnp.float32)
                tb_y = jnp.zeros((R, b), jnp.float32)
                tb_z = jnp.zeros((R, b), jnp.float32)

                def apply(jx, jy, jz, rax, ray, raz, rbx, rby, rbz):
                    nonlocal jx_t, jy_t, jz_t, ta_x, ta_y, ta_z, tb_x, tb_y, tb_z
                    jx_t = jx_t + jx; jy_t = jy_t + jy; jz_t = jz_t + jz
                    ta_x = ta_x + ray * jz - raz * jy
                    ta_y = ta_y + raz * jx - rax * jz
                    ta_z = ta_z + rax * jy - ray * jx
                    tb_x = tb_x + rby * jz - rbz * jy
                    tb_y = tb_y + rbz * jx - rbx * jz
                    tb_z = tb_z + rbx * jy - rby * jx

                # per-slot normal impulses (accumulated clamp on bf16 caches)
                sum_ln = jnp.zeros((R, b), jnp.float32)
                c_ax = jnp.zeros((R, b), jnp.float32)
                c_ay = jnp.zeros((R, b), jnp.float32)
                c_az = jnp.zeros((R, b), jnp.float32)
                c_w = jnp.zeros((R, b), jnp.float32)
                for k in range(N_SLOT):
                    s_rax, s_ray, s_raz, s_ikn, s_bias, _d0 = g_ra[k]
                    rax = s_rax[:, :]; ray = s_ray[:, :]; raz = s_raz[:, :]
                    bias = s_bias[:, :]
                    rbx = rax - dxc; rby = ray - dyc; rbz = raz - dzc
                    touch = (bias > -1e29).astype(jnp.float32)
                    s_ln = g_lam[k]
                    if is_warm:
                        lamw = (
                            s_ln[:, :].astype(jnp.float32) * (touch * warm)
                        ).astype(LAM_DT)
                        s_ln[:, :] = lamw
                        ln_eff = lamw.astype(jnp.float32)
                        dl = ln_eff
                    else:
                        ikn = s_ikn[:, :]
                        rvx = c_vx + c_wy * rbz - c_wz * rby - (r_vx + r_wy * raz - r_wz * ray)
                        rvy = c_vy + c_wz * rbx - c_wx * rbz - (r_vy + r_wz * rax - r_wx * raz)
                        rvz = c_vz + c_wx * rby - c_wy * rbx - (r_vz + r_wx * ray - r_wy * rax)
                        vn = rvx * nx + rvy * ny + rvz * nz
                        ln_old = s_ln[:, :].astype(jnp.float32)
                        ln_store = jnp.maximum(
                            ln_old - (vn - bias) * ikn, 0.0
                        ).astype(LAM_DT)
                        s_ln[:, :] = ln_store
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
                ltx_old = s_ltx[:, :].astype(jnp.float32)
                lty_old = s_lty[:, :].astype(jnp.float32)
                ltz_old = s_ltz[:, :].astype(jnp.float32)
                if is_warm:
                    gate = (c_w > 0.5).astype(jnp.float32) * warm
                    ltx_s = (ltx_old * gate).astype(LAM_DT)
                    lty_s = (lty_old * gate).astype(LAM_DT)
                    ltz_s = (ltz_old * gate).astype(LAM_DT)
                    djx = ltx_s.astype(jnp.float32)
                    djy = lty_s.astype(jnp.float32)
                    djz = ltz_s.astype(jnp.float32)
                else:
                    ikn0 = g_ra[0][3][:, :]
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
                s_ltx[:, :] = ltx_s
                s_lty[:, :] = lty_s
                s_ltz[:, :] = ltz_s
                apply(djx, djy, djz, rax, ray, raz, rbx, rby, rbz)

                # row side: -j / -torque_a via sublane reduction
                accx = -jnp.sum(jx_t, axis=0, keepdims=True)
                accy = -jnp.sum(jy_t, axis=0, keepdims=True)
                accz = -jnp.sum(jz_t, axis=0, keepdims=True)
                tqx = -jnp.sum(ta_x, axis=0, keepdims=True)
                tqy = -jnp.sum(ta_y, axis=0, keepdims=True)
                tqz = -jnp.sum(ta_z, axis=0, keepdims=True)
                # col side: +j / +torque_b through the matmul scatter
                if "sweep_scatter" not in ablate:  # DEBUG ablation
                    stage_scatter_pages([jx_t, jy_t, jz_t, tb_x, tb_y, tb_z])
                    scatter_phase(6)
                accx = accx + acc8[0:1, :]
                accy = accy + acc8[1:2, :]
                accz = accz + acc8[2:3, :]
                tqx = tqx + acc8[3:4, :]
                tqy = tqy + acc8[4:5, :]
                tqz = tqz + acc8[5:6, :]

                # --- plane-contact impulses (body side only, all NPK rows) -----
                prax = p_rax[:, :]; pray = p_ray[:, :]; praz = p_raz[:, :]
                pikn = p_ikn[:, :]; pbias = p_bias[:, :]
                pnex = p_nx[:, :]; pney = p_ny[:, :]; pnez = p_nz[:, :]
                if is_warm:
                    ptouch = (pbias > -1e29).astype(jnp.float32) * warm
                    plamw = pl_n[:, :] * ptouch
                    ltx_w = pl_tx[:, :] * ptouch
                    lty_w = pl_ty[:, :] * ptouch
                    ltz_w = pl_tz[:, :] * ptouch
                    pjx = pnex * plamw + ltx_w
                    pjy = pney * plamw + lty_w
                    pjz = pnez * plamw + ltz_w
                    pl_n[:, :] = plamw
                    pl_tx[:, :] = ltx_w
                    pl_ty[:, :] = lty_w
                    pl_tz[:, :] = ltz_w
                else:
                    bvx = s_vx[:]; bvy = s_vy[:]; bvz = s_vz[:]
                    bwx = s_wx[:]; bwy = s_wy[:]; bwz = s_wz[:]
                    rvx = bvx + bwy * praz - bwz * pray
                    rvy = bvy + bwz * prax - bwx * praz
                    rvz = bvz + bwx * pray - bwy * prax
                    vn = rvx * pnex + rvy * pney + rvz * pnez
                    ln_old = pl_n[:, :]
                    ln_new = jnp.maximum(ln_old - (vn - pbias) * pikn, 0.0)
                    dlam = ln_new - ln_old
                    pl_n[:, :] = ln_new
                    tvx = rvx - vn * pnex
                    tvy = rvy - vn * pney
                    tvz = rvz - vn * pnez
                    ltx_old = pl_tx[:, :]; lty_old = pl_ty[:, :]; ltz_old = pl_tz[:, :]
                    ltx_c = ltx_old - tvx * pikn
                    lty_c = lty_old - tvy * pikn
                    ltz_c = ltz_old - tvz * pikn
                    ltl = jnp.sqrt(ltx_c * ltx_c + lty_c * lty_c + ltz_c * ltz_c) + 1e-9
                    tscale = jnp.minimum(p_mu[:, :] * ln_new / ltl, 1.0)
                    ltx_n = ltx_c * tscale; lty_n = lty_c * tscale; ltz_n = ltz_c * tscale
                    pl_tx[:, :] = ltx_n; pl_ty[:, :] = lty_n; pl_tz[:, :] = ltz_n
                    pjx = pnex * dlam + (ltx_n - ltx_old)
                    pjy = pney * dlam + (lty_n - lty_old)
                    pjz = pnez * dlam + (ltz_n - ltz_old)
                accx = accx + jnp.sum(pjx, axis=0, keepdims=True)
                accy = accy + jnp.sum(pjy, axis=0, keepdims=True)
                accz = accz + jnp.sum(pjz, axis=0, keepdims=True)
                tqx = tqx + jnp.sum(pray * pjz - praz * pjy, axis=0, keepdims=True)
                tqy = tqy + jnp.sum(praz * pjx - prax * pjz, axis=0, keepdims=True)
                tqz = tqz + jnp.sum(prax * pjy - pray * pjx, axis=0, keepdims=True)

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

            if "warm" not in ablate:  # DEBUG ablation
                solve_iter(0, 0, is_warm=True)
            jax.lax.fori_loop(0, iterations, solve_iter, 0, unroll=False)

            # --- sleeping: wake propagation + deactivation timers --------------
            # runs at SLEEP_EVERY-substep cadence (15 Hz at 60 Hz substeps):
            # timers accumulate real time per check, so the sleep_time
            # threshold is reached at the same wall-clock; wake latency is at
            # most SLEEP_EVERY-1 substeps (bodies are awake during impact, so
            # the approximation only delays chain-reaction wakeups)
            if sleep:
              def sleep_update():
                vxs = s_vx[:]; vys = s_vy[:]; vzs = s_vz[:]
                wxs = s_wx[:]; wys = s_wy[:]; wzs = s_wz[:]
                sp2 = vxs * vxs + vys * vys + vzs * vzs + r_eff2[:] * (
                    wxs * wxs + wys * wys + wzs * wzs
                )
                moving = (sp2 >= sleep_v2).astype(jnp.float32)
                awake_f = 1.0 - s_sleep[:]
                s_pusher[:] = dynamic[:] * awake_f * moving
                # wake rows: gather partner pusher flags; wake cols: scatter own
                gather_phase([s_pusher[:]], 26)
                touch = jnp.zeros((R, b), jnp.float32)
                for k in range(N_SLOT):
                    touch = jnp.maximum(
                        touch,
                        (g_ra[k][4][:, :] > -1e29).astype(jnp.float32),
                    )
                wake = jnp.sum(touch * g3[26], axis=0, keepdims=True)
                stage_scatter_pages([touch * s_pusher[:]])
                scatter_phase(1)
                wake = wake + acc8[0:1, :]
                # plane contacts never wake (planes are static hubs)
                wk = (wake > 0.5).astype(jnp.float32)
                eligible = (1.0 - moving) * can_sleep[:] * (1.0 - wk)
                timer = (s_timer[:] + dt * SLEEP_EVERY) * eligible
                fall = (timer >= sleep_time).astype(jnp.float32) * eligible
                new_sleep = jnp.minimum(s_sleep[:] * (1.0 - wk) + fall, 1.0)
                s_sleep[:] = new_sleep
                s_timer[:] = timer
                s_awakef[:] = 1.0 - new_sleep
                keep = 1.0 - new_sleep
                s_vx[:] = vxs * keep; s_vy[:] = vys * keep; s_vz[:] = vzs * keep
                s_wx[:] = wxs * keep; s_wy[:] = wys * keep; s_wz[:] = wzs * keep

              pl.when((step_i % SLEEP_EVERY) == (SLEEP_EVERY - 1))(sleep_update)

            # --- integrate positions -------------------------------------------
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
          pl.when(jnp.sum(movable[:] * (1.0 - s_sleep[:])) > 0.5)(_active_substep)
      else:
          _active_substep()
      return carry

    jax.lax.fori_loop(0, n_sub, body_substep, 0)
    o_posx[:] = s_px[:]; o_posy[:] = s_py[:]; o_posz[:] = s_pz[:]
    o_velx[:] = s_vx[:]; o_vely[:] = s_vy[:]; o_velz[:] = s_vz[:]
    o_avx[:] = s_wx[:]; o_avy[:] = s_wy[:]; o_avz[:] = s_wz[:]
    o_qx[:] = s_qx[:]; o_qy[:] = s_qy[:]; o_qz[:] = s_qz[:]; o_qw[:] = s_qw[:]
    o_ovf[:] = s_ovf[:]
    if sleep:
        o_sleep[:] = s_sleep[:]
        o_timer[:] = s_timer[:]
    else:
        o_sleep[:] = asleep0[:]
        o_timer[:] = timer0[:]


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "n_substeps", "interpret", "warm", "geom_every", "sleep",
        "with_overflow", "resident_m", "band", "r_slots", "n_planes", "ablate",
    ),
)
def megakernel_substeps_compact(
    ps: PhysicsState,
    params: PhysicsParams,
    dt,
    n_substeps: int = 1,
    iterations: int = 3,
    interpret: bool = False,
    warm: float = 0.7,
    geom_every: int = 2,
    sleep: bool = False,
    with_overflow: bool = False,
    resident_m: bool | None = None,
    band: int = BAND,
    r_slots: int | None = None,
    n_planes: int = N_PLANE,
    ablate: tuple = (),  # DEBUG ONLY (scripts/scan_10k.py): phase ablation
):
    """Compacted-neighbor throughput path: slab-rank sort once per launch, run
    the compact kernel for `n_substeps`, permute results back to slot order.

    Returns the advanced PhysicsState; with `with_overflow=True` returns
    `(state, dropped)` where `dropped` is the total number of in-band AABB
    candidates that did not fit the R=16 neighbor slots at the last rebuild
    (the compaction analog of the banded kernel's out-of-band diagnostic).

    `resident_m` keeps the gather/scatter one-hot matrices VMEM-resident across
    substeps (fastest; ~16 KB VMEM per body). Default: resident up to 4096
    bodies, on-the-fly per-chunk rebuild above (10k-body capacity mode — the
    reference caps at MAX_BODIES=1024, `Physics.hpp:20-22`; BASELINE config 5
    asks for 10k)."""
    b = ps.num_slots
    if resident_m is None:
        resident_m = b <= 4096
    # `band` widens the rank window for scenes whose slab population exceeds
    # 128 (must stay a multiple of 128 — dynamic lane slices align to 128);
    # `r_slots` sets the neighbor-slot capacity (default 16 in both modes:
    # sublane tiling pads any 8<R<16 to 16 in every (R, b) VMEM page, so 12
    # costs exactly as much as 16 while dropping 10 pairs on the 10k rubble
    # piles; honesty is preserved by the `dropped` overflow diagnostic).
    assert band % 128 == 0 and band >= 128
    # `n_planes` sizes the hub-plane contact pages to the scene's LIVE plane
    # count (count_hub_planes) — a one-plane 10k scene pays 1/4 the plane VMEM
    assert 1 <= n_planes <= N_PLANE
    NPK = n_planes * N_SLOT  # noqa: F841 — shadows the module constant below
    R = r_slots if r_slots is not None else 16
    BAND = band            # noqa: F841 — shadow the module constants below
    SLAB = BCHUNK + band
    assert b % BCHUNK == 0 and b >= SLAB, (
        f"compact kernel needs capacity a multiple of {BCHUNK} and >= {SLAB}"
    )
    assert warm > 0.0, "compact kernel implements the warm-started solver only"
    assert not ps.has_proxies, (
        "compound bodies are not supported on the mega-kernel throughput path; "
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
    from .state import SHAPE_BOX as _SB
    is_box = (sorted_ps.shape_type == _SB).astype(jnp.float32)
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
                    jnp.asarray(0.04 * geom_every, jnp.float32),
                    jnp.asarray(float(n_substeps), jnp.float32),
                ]
            ),
            plane_block.astype(jnp.float32),
            jnp.stack([params.sleep_velocity**2, params.sleep_time]).astype(jnp.float32),
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
    r_eff = jnp.maximum(jnp.max(sp.half_extent, axis=1), sp.radius + sp.half_length)
    can_sleep = dyn * (1.0 - sp.is_character.astype(jnp.float32))
    inputs += [
        r1(sp.asleep.astype(jnp.float32)), r1(sp.sleep_timer),
        r1(r_eff * r_eff), r1(can_sleep),
    ]

    nc = b // BCHUNK
    out_shapes = [jax.ShapeDtypeStruct((1, b), jnp.float32)] * 16
    scratch = (
        [pltpu.VMEM((R, b), jnp.int32)] * 2                    # d_cur, d_new
        + (
            [pltpu.VMEM((nc * SLAB, R * BCHUNK), jnp.bfloat16)]  # M (Mbig layout)
            if resident_m else []
        )
        + [pltpu.VMEM((SLAB, SLAB), jnp.bfloat16)]             # tri
        + [pltpu.VMEM((GROWS, R, b), jnp.float32)]             # g3 col-state pages
        + [pltpu.VMEM((GSTG, b), jnp.bfloat16)]                # s_ghl
        + [pltpu.VMEM((SSTG, R * b), jnp.bfloat16)]            # sc_hl
        + [pltpu.VMEM((8, b), jnp.float32)]                    # acc8
        + [pltpu.VMEM((R, b), jnp.float32)] * N_PGEO
        + [pltpu.VMEM((R, b), LAM_DT)] * N_LAM
        + [pltpu.VMEM((NPK, b), jnp.float32)] * N_PGEO_P
        + [pltpu.VMEM((NPK, b), jnp.float32)] * N_PLAM
        + [pltpu.VMEM((1, b), jnp.float32)] * N_SMALL
        + ([pltpu.VMEM((1, b), jnp.float32)] * 4 if sleep else [])
    )
    outs = pl.pallas_call(
        partial(
            _compact_kernel,
            iterations=iterations, n_bodies=b, warm=warm, geom_every=geom_every,
            sleep=sleep, resident_m=resident_m, band=band, r_slots=R,
            n_planes=n_planes, ablate=tuple(ablate),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, *inputs)

    (npx, npy, npz, nvx, nvy, nvz, nwx, nwy, nwz, nqx, nqy, nqz, nqw,
     nsl, ntm, ovf) = [o.reshape(b) for o in outs]
    inv = jnp.zeros(b, jnp.int32).at[perm].set(iota)
    take = lambda x: x[inv]
    new_ps = dataclasses.replace(
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
    if with_overflow:
        return new_ps, jnp.sum(ovf)
    return new_ps
