"""Visibility-buffer rasterizer: per-tile depth-tested triangle raster.

Replaces the reference's hardware indexed-indirect visbuffer draw
(`/root/reference/Oxylus/src/Render/Passes/DrawGeometry.cpp:6-88`,
`Shaders/passes/visbuffer_encode.slang`) with a software tile raster designed for the
TPU's compute model:

- Reverse-Z depth test = a **max-merge**, which is order-independent → no sorting, no
  atomics: each tile keeps (depth, id) accumulators and folds triangles in any order
  (the u64 depth|id atomic-max trick of `visbuffer.slang:43-69`, lifted to whole-tile
  vector registers).
- Edge + depth plane evaluation is one matmul per (tile, meshlet): pixel matrix
  (P, 3) = [x, y, 1] times coefficient matrix (3, 4·64) → all 64 triangles' three edge
  values and depth at every pixel in a single MXU pass.
- The Pallas kernel keeps the whole tile state in VMEM across the meshlet loop; HBM
  traffic is one (3, 256) coefficient DMA per non-empty (tile, meshlet) pair.

The pure-JAX `rasterize_reference` is the slow-but-simple oracle used by tests and CPU
runs; `rasterize` picks the Pallas kernel on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# 64-px tiles measured ~1.7× faster than 32-px at 1080p on this target: the
# per-tile fixed cost (first coefficient DMA latency + grid step) dominates at
# ~1 hit/tile, and 4× fewer tiles beats the 4× larger per-hit matmul
TILE = 64
PIX = TILE * TILE


N_DEPTH_PLANES = 5  # e0 e1 e2 | zn wd (homogeneous raster: depth = zn/wd)


def pack_coeff_matrix(coeffs: Array, tri_valid: Array) -> Array:
    """(VM, R, 5, 3) → (VM, 3, 5R) matmul-ready: rows (a,b,c), cols plane-major
    [e0·R | e1·R | e2·R | zn·R | wd·R]. Invalid triangles already carry e0 ≡ -∞
    (ops/setup3d.py) so they never cover. R = 64 (one slot per meshlet triangle —
    homogeneous rasterization needs no near-plane clipping)."""
    vm, r = coeffs.shape[0], coeffs.shape[1]
    c = jnp.moveaxis(coeffs, 3, 1)  # (VM, abc, slot, plane)
    c = jnp.swapaxes(c, 2, 3)  # (VM, 3, 5, R)
    return c.reshape(vm, 3, N_DEPTH_PLANES * r)


def _tile_grid(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


# ---------------------------------------------------------------------------
# Pure-JAX reference (oracle / CPU path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_reference(
    coeff_mat: Array,   # (VM, 3, 256) from pack_coeff_matrix
    tile_list: Array,   # (T, K) vm slot or -1
    width: int,
    height: int,
) -> tuple[Array, Array]:
    """Returns (depth (H, W) f32 reverse-Z [0 far … 1 near], visid (H, W) i32, -1 empty)."""
    tx, ty = _tile_grid(width, height)
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    x0 = (tile_ids % tx) * TILE
    y0 = (tile_ids // tx) * TILE
    lin = jnp.arange(PIX, dtype=jnp.int32)
    px = (x0[:, None] + (lin % TILE)[None, :]).astype(jnp.float32) + 0.5
    py = (y0[:, None] + (lin // TILE)[None, :]).astype(jnp.float32) + 0.5
    pmat = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (T, PIX, 3)

    def step(carry, k):
        depth, vid = carry
        vm = tile_list[:, k]  # (T,)
        live = vm >= 0
        cm = coeff_mat[jnp.maximum(vm, 0)]  # (T, 3, 5R)
        r = cm.shape[-1] // N_DEPTH_PLANES
        e = jnp.einsum("tpc,tcq->tpq", pmat, cm)  # (T, PIX, 5R)
        e0, e1, e2 = e[..., :r], e[..., r : 2 * r], e[..., 2 * r : 3 * r]
        zn, wd = e[..., 3 * r : 4 * r], e[..., 4 * r :]
        cover = (
            (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            & (wd > 0) & (zn >= 0) & (zn <= wd)
            & live[:, None, None]
        )
        z = zn / jnp.where(wd > 0, wd, 1.0)
        zm = jnp.where(cover, z, -1.0)
        best = jnp.max(zm, axis=-1)  # (T, PIX)
        arg = jnp.argmax(zm, axis=-1).astype(jnp.int32)
        better = best > depth
        pid = (vm[:, None] << 8) | arg
        return (jnp.where(better, best, depth), jnp.where(better, pid, vid)), ()

    depth0 = jnp.zeros((n_tiles, PIX), jnp.float32)
    vid0 = jnp.full((n_tiles, PIX), -1, jnp.int32)
    (depth, vid), _ = jax.lax.scan(step, (depth0, vid0), jnp.arange(k_cap))

    def untile(a):
        a = a.reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    return untile(depth), untile(vid)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

ROWG = 8  # sublane row-group for blocked per-tile inputs (TPU block rule)


def _pmat16_local(tile: int = TILE):
    """(16, tile²) bf16 pixel matrix in TILE-LOCAL coordinates, rows
    [x, y, 1, 0×5] twice. Local coords k+0.5 (k < tile ≤ 64) are EXACTLY
    representable in bf16, which is what makes the single-pass bf16 plane
    matmul below exact: Precision.HIGHEST (6 bf16 passes) measured ~8 ms/frame
    at 1080p vs DEFAULT's one pass."""
    pix = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    xl = (lin % tile).astype(jnp.float32) + 0.5
    yl = (lin // tile).astype(jnp.float32) + 0.5
    r8 = jax.lax.broadcasted_iota(jnp.int32, (16, pix), 0) % 8
    pm = jnp.where(r8 == 0, xl, jnp.where(r8 == 1, yl, jnp.where(r8 == 2, 1.0, 0.0)))
    return pm.astype(jnp.bfloat16), xl, yl


def _local_hilo16(blk, x0, y0):
    """(8, C) f32 coefficient rows [a, b, c, 0…] → (16, C) bf16 operand
    [a_hi b_hi c'_hi 0… | a_lo b_lo c'_lo 0…] with c' = c + a·x0 + b·y0
    (tile-local constant). Contracted against _pmat16_local()'s 16 rows, the
    matmul itself sums the hi and lo partial products: e = (a_hi+a_lo)·xl +
    (b_hi+b_lo)·yl + (c'_hi+c'_lo), exact to ~2⁻¹⁶ relative — bf16×bf16
    products are exact in the f32 accumulator, so the only error is the
    hi/lo split truncation of the f32 coefficients."""
    cp = blk[2:3, :] + x0 * blk[0:1, :] + y0 * blk[1:2, :]
    rid = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    loc = jnp.where(rid == 2, cp, jnp.where(rid < 2, blk, 0.0))
    hi = loc.astype(jnp.bfloat16)
    lo = (loc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


def _raster_kernel(tile_list_ref, cnt_ref, tx_ref, coeff_ref, depth_out, vid_out):
    """Per-tile meshlet loop with every Mosaic/perf lesson from the 2D kernel
    (PERF_NOTES.md): coefficients resident in VMEM (serial per-hit DMAs cost
    ~15 µs), NO lax.cond (a dynamic-trip fori_loop runs exactly the tile's
    occupancy), lanes-=-pixels orientation so the matmul result (256, PIX) is
    sliced on 8-aligned sublane ranges."""
    t = pl.program_id(0)
    row = t % ROWG
    n_slots = coeff_ref.shape[-1] // N_DEPTH_PLANES  # 5R cols per meshlet; rows padded to 8

    tx = tx_ref[0]
    tg = t + tx_ref[1]  # global tile id (tx_ref[1] = shard band base, 0 single-chip)
    x0 = ((tg % tx) * TILE).astype(jnp.float32)
    y0 = ((tg // tx) * TILE).astype(jnp.float32)
    pmat16, _xl, _yl = _pmat16_local()

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_slots, PIX), 0)
    n = cnt_ref[row, 0]

    def loop(k, carry):
        depth, vid = carry  # (1, PIX) f32 / i32
        vm = tile_list_ref[row, k]
        blk = _local_hilo16(coeff_ref[pl.ds(vm * 8, 8), :], x0, y0)  # (16, 5R) bf16
        e = jax.lax.dot_general(
            blk, pmat16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5R, PIX) — plane-major rows: e0 | e1 | e2 | zn | wd
        e0 = e[0:n_slots, :]
        e1 = e[n_slots : 2 * n_slots, :]
        e2 = e[2 * n_slots : 3 * n_slots, :]
        zn = e[3 * n_slots : 4 * n_slots, :]
        wd = e[4 * n_slots :, :]
        cover = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (wd > 0) & (zn >= 0) & (zn <= wd)
        z = zn / jnp.where(wd > 0, wd, 1.0)
        zm = jnp.where(cover, z, -1.0)  # (R, PIX)
        best = jnp.max(zm, axis=0, keepdims=True)  # (1, PIX)
        # first-max slot (argmax semantics) via masked min-reduction
        arg = jnp.min(
            jnp.where(zm >= best, slot_iota, jnp.int32(1 << 20)), axis=0, keepdims=True
        )
        better = best > depth
        pid = vm * 256 + arg
        return jnp.where(better, best, depth), jnp.where(better, pid, vid)

    depth0 = jnp.zeros((1, PIX), jnp.float32)
    vid0 = jnp.full((1, PIX), -1, jnp.int32)
    depth, vid = jax.lax.fori_loop(0, n, loop, (depth0, vid0))
    # row write into the 8-tile output block: keeps the kernel's natural (1, PIX)
    # lanes-major layout — the old (PIX, 1) transposed stores cost a full Mosaic
    # relayout per tile and used 1 of 128 store lanes
    depth_out[pl.ds(row, 1), :] = depth
    vid_out[pl.ds(row, 1), :] = vid


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def rasterize_pallas(coeff_mat: Array, tile_list: Array, width: int, height: int,
                     interpret: bool = False, tile_base: Array | int = 0):
    tx, ty = _tile_grid(width, height)
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    vm = coeff_mat.shape[0]

    # (VM, 3, 4R) → (VM*8, 4R): 8-row-padded blocks, dynamic sublane slices in-kernel
    coeff_pad = jnp.pad(coeff_mat, ((0, 0), (0, 5), (0, 0))).reshape(vm * 8, -1)
    cnt = jnp.sum((tile_list >= 0).astype(jnp.int32), axis=1, keepdims=True)  # (T, 1)
    tl_c = jnp.maximum(tile_list, 0)

    def pad_rows(a, fill):
        if a.shape[0] % ROWG != 0:
            p = ROWG - a.shape[0] % ROWG
            a = jnp.pad(a, ((0, p), (0, 0)), constant_values=fill)
        return a

    n_tiles_pad = ((n_tiles + ROWG - 1) // ROWG) * ROWG
    depth, vid = pl.pallas_call(
        _raster_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWG, k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWG, 1), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coefficients resident in VMEM
        ],
        out_specs=[
            pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pad_rows(tl_c, 0), pad_rows(cnt, 0),
      jnp.stack([jnp.asarray(tx, jnp.int32), jnp.asarray(tile_base, jnp.int32)]),
      coeff_pad)

    def untile(a):
        a = a[:n_tiles].reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    return untile(depth), untile(vid)


def rasterize(coeff_mat: Array, tile_list: Array, width: int, height: int):
    """Dispatch: Pallas on TPU, reference elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return rasterize_pallas(coeff_mat, tile_list, width, height)
    return rasterize_reference(coeff_mat, tile_list, width, height)


# ---------------------------------------------------------------------------
# G-buffer raster: attributes interpolated in-kernel (no decode gather pass)
# ---------------------------------------------------------------------------

N_GB_PLANES = 5    # e0 e1 e2 zn wd — phase-A (depth resolve) planes; ss (Σeᵢ)
                   # moved to phase B (round 4): the resolve is VPU-throughput
                   # bound on its (planes·R, PIX) intermediate, and ss is only
                   # needed once per pixel for the winner
N_GB_ATTR = 16     # per-pixel G-buffer lanes emitted by the kernel
ATTR_W = 64        # phase-B lanes per slot: [a(16) | b(16) | c(16) | consts(16)]
                   # groups; lane 8 of each coefficient group carries the ss plane


def pack_gbuffer_coeff_matrix(
    coeffs: Array,       # (VM, R, 5, 3) from setup_triangles
    attr_planes: Array,  # (VM, R, 9, 3) from setup_triangles: ss + nrm + uv + tangent
    tri_valid: Array,    # (VM, R)
    mat_consts: Array,   # (VM, 8) per-meshlet material constants
) -> tuple[Array, Array]:
    """Two-phase coefficient pack for the G-buffer raster kernel.

    Returns (cm5, attrB):
      - cm5 (VM, 3, 5R): plane-major [e0 | e1 | e2 | zn | wd] matmul matrix for
        the phase-A depth/winner resolve — identical layout to pack_coeff_matrix.
      - attrB (VM·R, 128): per-slot attribute-plane coefficients for the phase-B
        winner gather, four 16-lane groups
        [a₀…a₇ ssₐ 0×7 | b₀…b₇ ss_b 0×7 | c₀…c₇ ss_c 0×7 | consts×8 0×8]:
        after the one-hot slot matmul, attr = a·px + b·py + c evaluates the 8
        perspective planes (wnrm xyz, uv, tangent xyz — handedness in |T|) PLUS
        the ss = Σeᵢ plane in lane 8 (the perspective divisor — phase A no
        longer resolves it), and the fourth group broadcasts the 8 per-meshlet
        material constants, replacing the reference's per-pixel
        visbuffer_decode.slang material fetch.

    Splitting depth resolve from attribute evaluation is the TPU-shaped analog of
    the reference's visbuffer encode/decode split: the per-hit resolve is
    VPU-throughput-bound on its (planes·R, PIX) intermediate (22→6→5 planes),
    and attributes are evaluated once per pixel for the *winning* slot only
    instead of for all R slots per hit."""
    vm, r = coeffs.shape[0], coeffs.shape[1]
    cm5 = pack_coeff_matrix(coeffs, tri_valid)

    ap = attr_planes[:, :, 1:9, :]        # (VM, R, 8, 3) perspective attr planes
    ssp = attr_planes[:, :, 0, :]         # (VM, R, 3) ss plane (a, b, c)
    z7 = jnp.zeros((vm, r, 7), ap.dtype)
    z8 = jnp.zeros((vm, r, 8), ap.dtype)
    # (VM, 8) per-meshlet consts broadcast to slots; (VM, R, 8) accepted as-is
    # (dense compacted groups mix source meshlets — compact_triangles)
    if mat_consts.ndim == 2:
        consts = jnp.broadcast_to(mat_consts[:, None, :], (vm, r, 8)).astype(ap.dtype)
    else:
        consts = mat_consts.astype(ap.dtype)
    attrB = jnp.concatenate(
        [
            ap[..., 0], ssp[..., 0:1], z7,
            ap[..., 1], ssp[..., 1:2], z7,
            ap[..., 2], ssp[..., 2:3], z7,
            consts, z8,
        ],
        axis=-1,
    )  # (VM, R, 64): 16-lane groups [a+ssₐ | b+ss_b | c+ss_c | consts]
    # no lane padding here: the resident path consumes 64 lanes directly
    # (pack_attrB_hilo emits the [hi64|lo64] 128-lane matrix) and only the HBM
    # fallback pads to Mosaic's 128-lane DMA granularity, so the common path
    # never materializes 33 MB of zero lanes
    return cm5, attrB.reshape(vm * r, ATTR_W)


# VMEM budget for the resident-attribute raster variant: the bf16 hi/lo packed
# attribute matrix (VM·R, 128) costs VM·R·256 bytes; together with the resident
# 6-plane matrix and the pipeline's output blocks it must stay under the 110 MB
# whole-kernel VMEM budget for the residency decision (the chip exposes
# 128 MB; leave allocator slack). rasterize_gbuffer_pallas decides per shape
# at trace time by budgeting EVERY resident buffer + live temporaries.
VMEM_BUDGET_BYTES = 108 * 1024 * 1024


def pack_attrB_hilo(attrB: Array) -> Array:
    """(VM·R, 64) f32 → (VM·R, 128) bf16 [hi(64) | lo(64)]: one resident bf16
    matrix whose single (R,128)ᵀ·(R,PIX) matmul yields both hi and lo one-hot
    selections (rows 0:64 and 64:128 of the result), exact to ~2^-16 relative."""
    a = attrB[:, :ATTR_W]
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def _make_gbuffer_kernel(tile: int):
    """Factory closing over the static tile size (32 or 64 px): per-hit work —
    the (6R, tile²) phase-A plane evaluation and its elementwise resolve — is
    VPU-throughput-bound and scales with tile², while the hit count only grows
    ~1.6× at half tile (sponza occupancy, PERF_NOTES r4), so smaller tiles trade
    a small fixed-cost increase for a large per-hit saving on dense scenes."""
    pix = tile * tile

    def _gbuffer_kernel(
        tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_hbm,
        depth_out, vid_out, gb_out, bbuf, bsem
    ):
        return _gbuffer_kernel_body(
            tile, pix,
            tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_hbm,
            depth_out, vid_out, gb_out, bbuf, bsem,
        )

    return _gbuffer_kernel


def _gbuffer_kernel_body(
    TILE, PIX,
    tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_hbm,
    depth_out, vid_out, gb_out, bbuf, bsem
):
    """Two-phase G-buffer raster (per tile):

    Phase A — depth resolve: per binned meshlet, one (8, 6R)×(8, PIX) matmul
    evaluates edge/zn/wd/ss planes for all R slots; reverse-Z max picks the
    winner. Carries (depth, vid, ss) only. The old single-phase kernel evaluated
    22 planes here; the (22R, PIX) intermediate (~23 MB at TILE=64) was ~5× the
    per-hit VMEM traffic of this 6-plane resolve.

    Phase B — winner-attribute gather: re-walks the tile's meshlet list, builds a
    one-hot (R, PIX) mask of pixels whose resolved vid belongs to slot s of this
    meshlet, and pulls the winning slot's 48 attribute coefficients with ONE
    (R, 48)ᵀ·(R, PIX) matmul; attr = a·px + b·py + c finishes the evaluation.
    Attribute work is per-pixel (winner only), not per-slot-per-pixel.

    The attrB matrix stays in HBM; each (R, 48) block is DMA'd double-buffered —
    the k=0 fetch is issued before phase A runs, so its latency hides under the
    depth resolve."""
    t = pl.program_id(0)
    row = t % ROWG
    n_slots = cm6_vmem.shape[-1] // N_GB_PLANES
    k_cap = tile_list_ref.shape[1]

    tx = tx_ref[0]
    tg = t + tx_ref[1]  # global tile id (tx_ref[1] = shard band base, 0 single-chip)
    x0 = ((tg % tx) * TILE).astype(jnp.float32)
    y0 = ((tg // tx) * TILE).astype(jnp.float32)
    pmat16, xl, yl = _pmat16_local(TILE)
    px = x0 + xl  # global coords for the phase-B f32 attribute evaluation
    py = y0 + yl

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_slots, PIX), 0)
    n = cnt_ref[row, 0]

    def bfetch(k, par):
        vm = tile_list_ref[row, jnp.minimum(k, k_cap - 1)]
        pltpu.make_async_copy(
            attr_hbm.at[pl.ds(vm * n_slots, n_slots), :],
            bbuf.at[pl.ds(par * n_slots, n_slots), :],
            bsem.at[par],
        ).start()

    # issue the phase-B k=0 fetch before phase A: its ~15 µs latency hides under
    # the depth resolve (a lax.cond costs ~1.5 µs; an unconditional fetch on
    # every mostly-empty tile costs far more)
    jax.lax.cond(n > 0, lambda: bfetch(0, 0), lambda: None)

    # winner packing — see _gbuffer_kernel_resident_body
    slot_code = 127 - slot_iota

    def cond_a(carry):
        k, key, vid = carry
        # coverage early-out (front-to-back lists): stop once no pixel can be
        # beaten by the next (hence any later) meshlet's nearest z. The near
        # bound rides the SMEM tile-list layout (one entry per (tile, k)),
        # shipped as int32 BIT PATTERNS of the f32 near values: positive IEEE
        # floats order identically as ints, and Mosaic rejects scalar bitcast
        # in-kernel. A per-MESHLET SMEM table costs 512 B/row and blew the
        # 1 MB SMEM at the sponza caps (vm=2048 -> 1.0 MB; BENCH_r03).
        dmin = jnp.min(key) & ~jnp.int32(127)
        return (k < n) & (dmin < near_ref[row, jnp.minimum(k, k_cap - 1)])

    def loop_a(carry):
        k, key, vid = carry
        vm = tile_list_ref[row, k]
        blk = _local_hilo16(cm6_vmem[pl.ds(vm * 8, 8), :], x0, y0)  # (16, 5R) bf16
        e = jax.lax.dot_general(
            blk, pmat16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5R, PIX)
        e0 = e[0:n_slots, :]
        e1 = e[n_slots : 2 * n_slots, :]
        e2 = e[2 * n_slots : 3 * n_slots, :]
        zn = e[3 * n_slots : 4 * n_slots, :]
        wd = e[4 * n_slots :, :]
        # cover folded into ONE min-tree + one compare (was 4 compares + 3
        # ands): inside ⇔ min(e0,e1,e2, zn, wd−zn, wd−tiny) ≥ 0 — the resolve
        # is VPU-throughput-bound on (R, PIX) (trace r5), every op counts
        m = jnp.minimum(jnp.minimum(e0, e1), e2)
        q = jnp.minimum(jnp.minimum(m, zn), jnp.minimum(wd - zn, wd - 1e-30))
        cover = q >= 0
        z = zn * (1.0 / jnp.maximum(wd, 1e-30))
        zi = (jax.lax.bitcast_convert_type(z, jnp.int32) & ~jnp.int32(127)) | slot_code
        keyk = jnp.max(jnp.where(cover, zi, -1), axis=0, keepdims=True)
        better = keyk > key
        vid = jnp.where(better, vm * 256 + (127 - (keyk & 127)), vid)
        return k + 1, jnp.where(better, keyk, key), vid

    key0 = jnp.zeros((1, PIX), jnp.int32)
    vid0 = jnp.full((1, PIX), -1, jnp.int32)
    kstop, key, vid = jax.lax.while_loop(
        cond_a, loop_a, (jnp.int32(0), key0, vid0)
    )
    depth = jax.lax.bitcast_convert_type(key & ~jnp.int32(127), jnp.float32)

    def loop_b(k, carry):
        pa, pc = carry
        par = k % 2
        # prefetch k+1 into the other buffer before waiting on k (clamped: the
        # last iteration re-fetches its own block, which is then drained below)
        bfetch(jnp.minimum(k + 1, n - 1), 1 - par)
        pltpu.make_async_copy(
            attr_hbm.at[pl.ds(0, n_slots), :],
            bbuf.at[pl.ds(par * n_slots, n_slots), :],
            bsem.at[par],
        ).wait()
        blk = bbuf[pl.ds(par * n_slots, n_slots), :][:, 0:ATTR_W]  # (R, 64)
        vm = tile_list_ref[row, k]
        kye = vid - vm * 256  # (1, PIX): winner slot if this meshlet won, else ∉[0,R)
        onehot = (slot_iota == kye).astype(jnp.float32)  # (R, PIX)
        # one-hot selection matmul in two bf16 passes (Mosaic has no Precision.HIGH):
        # hi keeps the top 8 mantissa bits, lo the next 8 — onehot is exact, so the
        # sum reconstructs the selected coefficient to ~2^-16 relative
        hi = blk.astype(jnp.bfloat16).astype(jnp.float32)
        lo = blk - hi
        dn = (((0,), (0,)), ((), ()))
        sel = jax.lax.dot_general(
            hi, onehot, dimension_numbers=dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            lo, onehot, dimension_numbers=dn, preferred_element_type=jnp.float32
        )  # (64, PIX): winning slot's coefficients, 0 where this meshlet lost
        a = sel[0:16, :]
        b = sel[16:32, :]
        c = sel[32:48, :]
        cst = sel[48:64, :]
        attrs = a * px + b * py + c  # lanes 0..7 persp planes, lane 8 = ss
        mine = (kye >= 0) & (kye < n_slots)
        return jnp.where(mine, attrs, pa), jnp.where(mine, cst, pc)

    # only the k that rasterized can have won pixels — skip the tail
    pa, pc = jax.lax.fori_loop(
        0, kstop, loop_b,
        (jnp.zeros((N_GB_ATTR, PIX), jnp.float32),
         jnp.zeros((N_GB_ATTR, PIX), jnp.float32)),
    )
    # drain the one outstanding prefetch (issued for slot kstop, parity
    # kstop % 2 — also covers the early-out kstop==0 case where only the
    # pre-issued k=0 fetch is in flight); nothing was fetched for empty tiles
    jax.lax.cond(
        n > 0,
        lambda: pltpu.make_async_copy(
            attr_hbm.at[pl.ds(0, n_slots), :],
            bbuf.at[pl.ds((kstop % 2) * n_slots, n_slots), :],
            bsem.at[kstop % 2],
        ).wait(),
        lambda: None,
    )

    ssb = pa[8:9, :]  # winner's Σeᵢ, evaluated as attribute lane 8
    rw = 1.0 / jnp.where(jnp.abs(ssb) > 1e-12, ssb, 1.0)
    # row writes into the 8-tile output blocks, keeping the kernel's (1, PIX)
    # lanes-major layout — the old per-tile transposes to (PIX, 1/16) columns
    # were the dominant fixed cost of empty tiles
    depth_out[pl.ds(row, 1), :] = depth
    vid_out[pl.ds(row, 1), :] = vid
    # first 8 attrs are perspective planes (÷ Σeᵢ of the winner); last 8 consts
    # bf16 G-buffer: normals/uv/material factors tolerate 8-bit mantissas and
    # the (T*16, PIX) untile chain halves its traffic; world position is
    # reconstructed from f32 depth downstream, never stored
    gb_out[pl.ds(row * N_GB_ATTR, 8), :] = (pa[0:8, :] * rw).astype(jnp.bfloat16)
    gb_out[pl.ds(row * N_GB_ATTR + 8, 8), :] = pc[0:8, :].astype(jnp.bfloat16)


def _make_gbuffer_kernel_resident(tile: int, phases: str = "ab"):
    """Factory closing over the static tile size — see _make_gbuffer_kernel.
    `phases` is a profiling-only ablation knob: "a" skips the phase-B
    attribute loop (gb_out left zero) to attribute kernel time on-device."""
    pix = tile * tile

    def _gbuffer_kernel_resident(
        tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_vmem,
        depth_out, vid_out, gb_out
    ):
        return _gbuffer_kernel_resident_body(
            tile, pix,
            tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_vmem,
            depth_out, vid_out, gb_out, phases=phases,
        )

    return _gbuffer_kernel_resident


def _gbuffer_kernel_resident_body(
    TILE, PIX,
    tile_list_ref, cnt_ref, tx_ref, near_ref, cm6_vmem, attr_vmem,
    depth_out, vid_out, gb_out, phases: str = "ab",
):
    """Resident-attribute G-buffer raster: identical to `_gbuffer_kernel` except
    phase B reads the winner's attribute coefficients from a VMEM-resident
    bf16 hi/lo matrix (pack_attrB_hilo) — no per-hit DMA, no semaphores, and
    ONE (R,128)·(R,PIX) matmul per hit whose result carries hi rows 0:48 and
    lo rows 64:112. Chosen by rasterize_gbuffer_pallas when the matrix fits
    the VMEM budget; the HBM double-buffered variant handles larger scenes.

    Coverage early-out: with front-to-back tile lists (cull_meshlets
    depth_sort) phase A is a while loop that stops once every pixel's resolved
    reverse-Z depth ≥ the next meshlet's conservative nearest z (`near_ref`) —
    it cannot win anywhere, and neither can anything behind it. Phase B then
    walks only the k that actually rasterized. This is the TPU analog of
    early-Z + the reference's two-pass occlusion inside one tile."""
    t = pl.program_id(0)
    row = t % ROWG
    n_slots = cm6_vmem.shape[-1] // N_GB_PLANES
    k_cap = tile_list_ref.shape[1]

    tx = tx_ref[0]
    tg = t + tx_ref[1]  # global tile id (tx_ref[1] = shard band base, 0 single-chip)
    x0 = ((tg % tx) * TILE).astype(jnp.float32)
    y0 = ((tg // tx) * TILE).astype(jnp.float32)
    pmat16, xl, yl = _pmat16_local(TILE)
    px = x0 + xl  # global coords for the phase-B f32 attribute evaluation
    py = y0 + yl

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_slots, PIX), 0)
    # winner packing (round 4): reverse-Z depth and slot share ONE i32 key —
    # positive IEEE f32s compare identically as ints, so clearing the low 7
    # mantissa bits and OR-ing (127 - slot) makes a single max-reduce resolve
    # depth AND winner slot together (ties → lower slot, matching the oracle's
    # first-max argmax). This removes the argmin pass and the ss-select pass,
    # the two largest VPU costs of the old resolve after the cover test.
    slot_code = 127 - slot_iota
    n = cnt_ref[row, 0]

    def cond_a(carry):
        k, key, vid = carry
        # `depth > near` anywhere ⇔ the meshlet could still win a pixel
        # (ties lose: the resolve keeps the earlier = nearer winner).
        # near rides the SMEM tile-list layout — see _gbuffer_kernel — as the
        # int32 BIT PATTERNS of the f32 near values: positive IEEE floats
        # order identically as ints, and keys are depth-major (slot bits
        # minor), so the all-int compare is the float compare to within one
        # 2^-16 quantum (Mosaic rejects scalar bitcast in-kernel).
        dmin = jnp.min(key) & ~jnp.int32(127)
        return (k < n) & (dmin < near_ref[row, jnp.minimum(k, k_cap - 1)])

    def loop_a(carry):
        k, key, vid = carry
        vm = tile_list_ref[row, k]
        blk = _local_hilo16(cm6_vmem[pl.ds(vm * 8, 8), :], x0, y0)  # (16, 5R) bf16
        e = jax.lax.dot_general(
            blk, pmat16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5R, PIX)
        e0 = e[0:n_slots, :]
        e1 = e[n_slots : 2 * n_slots, :]
        e2 = e[2 * n_slots : 3 * n_slots, :]
        zn = e[3 * n_slots : 4 * n_slots, :]
        wd = e[4 * n_slots :, :]
        # cover folded into ONE min-tree + one compare (was 4 compares + 3
        # ands): inside ⇔ min(e0,e1,e2, zn, wd−zn, wd−tiny) ≥ 0 — the resolve
        # is VPU-throughput-bound on (R, PIX) (trace r5), every op counts
        m = jnp.minimum(jnp.minimum(e0, e1), e2)
        q = jnp.minimum(jnp.minimum(m, zn), jnp.minimum(wd - zn, wd - 1e-30))
        cover = q >= 0
        z = zn * (1.0 / jnp.maximum(wd, 1e-30))
        zi = (jax.lax.bitcast_convert_type(z, jnp.int32) & ~jnp.int32(127)) | slot_code
        keyk = jnp.max(jnp.where(cover, zi, -1), axis=0, keepdims=True)
        better = keyk > key
        vid = jnp.where(better, vm * 256 + (127 - (keyk & 127)), vid)
        return k + 1, jnp.where(better, keyk, key), vid

    key0 = jnp.zeros((1, PIX), jnp.int32)
    vid0 = jnp.full((1, PIX), -1, jnp.int32)
    kstop, key, vid = jax.lax.while_loop(
        cond_a, loop_a, (jnp.int32(0), key0, vid0)
    )
    depth = jax.lax.bitcast_convert_type(key & ~jnp.int32(127), jnp.float32)

    def loop_b(k, carry):
        pa, pc = carry
        vm = tile_list_ref[row, k]
        blk = attr_vmem[pl.ds(vm * n_slots, n_slots), :]  # (R, 128) bf16 resident
        kye = vid - vm * 256
        onehot = (slot_iota == kye).astype(jnp.bfloat16)
        sel = jax.lax.dot_general(
            blk, onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, PIX): rows 0:64 hi selection, 64:128 lo selection
        a = sel[0:16, :] + sel[64:80, :]
        b = sel[16:32, :] + sel[80:96, :]
        c = sel[32:48, :] + sel[96:112, :]
        cst = sel[48:64, :] + sel[112:128, :]
        attrs = a * px + b * py + c  # lanes 0..7 persp planes, lane 8 = ss
        mine = (kye >= 0) & (kye < n_slots)
        return jnp.where(mine, attrs, pa), jnp.where(mine, cst, pc)

    # only the k that rasterized can have won pixels — skip the tail
    if "b" in phases:
        pa, pc = jax.lax.fori_loop(
            0, kstop, loop_b,
            (jnp.zeros((N_GB_ATTR, PIX), jnp.float32),
             jnp.zeros((N_GB_ATTR, PIX), jnp.float32)),
        )
    else:  # profiling ablation: phase A only
        pa = jnp.zeros((N_GB_ATTR, PIX), jnp.float32)
        pc = pa

    ssb = pa[8:9, :]  # winner's Σeᵢ, evaluated as attribute lane 8
    rw = 1.0 / jnp.where(jnp.abs(ssb) > 1e-12, ssb, 1.0)
    depth_out[pl.ds(row, 1), :] = depth
    vid_out[pl.ds(row, 1), :] = vid
    # bf16 G-buffer: normals/uv/material factors tolerate 8-bit mantissas and
    # the (T*16, PIX) untile chain halves its traffic; world position is
    # reconstructed from f32 depth downstream, never stored
    gb_out[pl.ds(row * N_GB_ATTR, 8), :] = (pa[0:8, :] * rw).astype(jnp.bfloat16)
    gb_out[pl.ds(row * N_GB_ATTR + 8, 8), :] = pc[0:8, :].astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("width", "height", "interpret", "tile", "phases"))
def rasterize_gbuffer_pallas(
    coeff_mat: Array, attr_mat: Array, tile_list: Array, width: int, height: int,
    interpret: bool = False, ml_near: Array | None = None, tile: int = TILE,
    phases: str = "ab", tile_base: Array | int = 0,
):
    """Returns (depth (H,W), vid (H,W) i32, gbuffer (H,W,16)) — lanes
    [wpos xyz, wnrm xyz, uv, alb rgb, metallic, roughness, emissive rgb].
    coeff_mat (VM, 3, 6R) + attr_mat (VM·R, 48) from pack_gbuffer_coeff_matrix.

    `ml_near` (VM,) f32 — conservative nearest reverse-Z depth per meshlet.
    With front-to-back tile lists (cull_meshlets depth_sort) it drives the
    kernels' coverage early-out; None disables the exit (near = +inf).

    `tile` (static) — tile edge in px; the tile_list must have been binned at
    the same size. Per-hit cost scales with tile² (VPU-bound resolve) while the
    hit count shrinks sublinearly, so dense scenes prefer 32."""
    TILE, PIX = tile, tile * tile
    tx = (width + TILE - 1) // TILE
    ty = (height + TILE - 1) // TILE
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    vm = coeff_mat.shape[0]
    n_slots = coeff_mat.shape[-1] // N_GB_PLANES

    coeff_pad = jnp.pad(coeff_mat, ((0, 0), (0, 5), (0, 0))).reshape(vm * 8, -1)
    cnt = jnp.sum((tile_list >= 0).astype(jnp.int32), axis=1, keepdims=True)
    tl_c = jnp.maximum(tile_list, 0)
    # early-out near bound per (tile, k) entry, SAME blocked SMEM layout as the
    # tile list. A per-meshlet SMEM table costs 512 B/row in SMEM and exceeded
    # the chip's 1 MB SMEM at the sponza caps (vm=2048) — BENCH_r03 post-mortem.
    # Shipped as int32 bit patterns (clamped non-negative): the kernels compare
    # against the winner key entirely in int space (see cond_a).
    tl_near_f = (
        jnp.full(tile_list.shape, jnp.float32(jnp.finfo(jnp.float32).max))
        if ml_near is None
        else jnp.maximum(ml_near.astype(jnp.float32), 0.0)[tl_c]
    )
    tl_near = jax.lax.bitcast_convert_type(tl_near_f, jnp.int32)

    def pad_rows(a, fill):
        if a.shape[0] % ROWG != 0:
            p = ROWG - a.shape[0] % ROWG
            a = jnp.pad(a, ((0, p), (0, 0)), constant_values=fill)
        return a

    n_tiles_pad = ((n_tiles + ROWG - 1) // ROWG) * ROWG
    out_specs = [
        pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
        pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
        pl.BlockSpec((ROWG * N_GB_ATTR, PIX), lambda t: (t // ROWG, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles_pad * N_GB_ATTR, PIX), jnp.bfloat16),
    ]
    base_specs = [
        pl.BlockSpec((ROWG, k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((ROWG, 1), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        # per-(tile, k) nearest z for the early-out — blocked like the tile list
        pl.BlockSpec((ROWG, k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # 6-plane matrix resident in VMEM
    ]
    args = (pad_rows(tl_c, 0), pad_rows(cnt, 0),
            jnp.stack([jnp.asarray(tx, jnp.int32), jnp.asarray(tile_base, jnp.int32)]),
            pad_rows(tl_near, 0), coeff_pad)
    # Honest VMEM budget (BENCH_r03 post-mortem: the old heuristic budgeted the
    # attribute matrix ALONE and picked "resident" at capacities whose total
    # working set did not fit). Everything resident must fit: the f32 coeff
    # matrix, the bf16 hi/lo attribute matrix, the double-buffered output
    # blocks, and the kernel's live temporaries (phase-A plane matrix e
    # (6R, PIX) f32 + cover masks + phase-B one-hot/selection products).
    out_block_bytes = 2 * ROWG * PIX * (4 + 4 + N_GB_ATTR * 2)  # 2x buffered
    temp_bytes = (
        5 * n_slots * PIX * 4      # e, phase A (5 planes; ss rides phase B)
        + 8 * n_slots * PIX        # ~8 single-byte masks/selects on e's shape
        + 2 * n_slots * PIX * 2    # phase-B one-hot (R, PIX) bf16 x2 live
        + 128 * PIX * 4            # phase-B sel (128, PIX) f32
        + 4 * N_GB_ATTR * PIX * 4  # attrs/cst accumulators
        + (8 << 20)                # headroom: pmat16, carries, allocator slack
    )
    cm6_bytes = coeff_pad.size * 4
    attr_res_bytes = attr_mat.shape[0] * 128 * 2  # pack_attrB_hilo output
    if cm6_bytes + attr_res_bytes + out_block_bytes + temp_bytes <= VMEM_BUDGET_BYTES:
        # resident phase B: the bf16 hi/lo attribute matrix lives in VMEM —
        # no per-hit DMA latency (dominant on ~1-hit tiles), no drain conds
        depth, vid, gb = pl.pallas_call(
            _make_gbuffer_kernel_resident(TILE, phases),
            grid=(n_tiles,),
            in_specs=base_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args, pack_attrB_hilo(attr_mat))
    else:
        # HBM fallback still keeps cm6 resident — assert the one thing it needs
        # fits, with an actionable message instead of a compiler OOM dump
        assert cm6_bytes + out_block_bytes + temp_bytes <= VMEM_BUDGET_BYTES, (
            f"coefficient matrix alone ({cm6_bytes >> 20} MB at vm={vm}) exceeds "
            f"the VMEM budget — lower max_visible_meshlets (cm6 costs 12 KB/slot)"
        )
        depth, vid, gb = pl.pallas_call(
            _make_gbuffer_kernel(TILE),
            grid=(n_tiles,),
            in_specs=base_specs + [pl.BlockSpec(memory_space=pl.ANY)],  # attrs in HBM
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2 * n_slots, 128), jnp.float32),  # phase-B double buffer
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
            # lane-pad to 128 here only: Mosaic DMA slices of HBM arrays need
            # 128-aligned lane widths (the resident path never pays this)
        )(*args, jnp.pad(attr_mat, ((0, 0), (0, 128 - ATTR_W))))

    def untile(a):
        a = a[:n_tiles].reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    # gb rows are (tile-major × 16 attrs): (T*16, PIX) → (H, W, 16)
    gbt = gb[: n_tiles * N_GB_ATTR].reshape(ty, tx, N_GB_ATTR, TILE, TILE)
    gbt = gbt.transpose(0, 3, 1, 4, 2).reshape(ty * TILE, tx * TILE, N_GB_ATTR)
    return untile(depth), untile(vid), gbt[:height, :width]


# ---------------------------------------------------------------------------
# Per-tile triangle raster (round 5): loop-free rounds over dense entry lists
# ---------------------------------------------------------------------------

TILE_ROUND = 64          # entries resolved per kernel round (one matmul each)
_RND_LANES = 384         # per-round lane stride: 5·64 planes padded to 3×128
                         # (dynamic lane slices of values must be 128-aligned)


def build_tile_comb(
    dense: dict,          # compact_triangles / passthrough_groups output
    consts: Array,        # (G, R, 8) or (G, 8) per-slot material constants
    mat_rows: Array | None = None,  # (M, 32) packed material rows (textured)
) -> tuple[Array, int]:
    """The combined per-slot row matrix every raster pass gathers from:
    [attrB 64 | coeff 15 | tz | mat | inst | pid | mat_row n]. Built ONCE per
    frame from the full-visibility triangle set and shared by the opaque/
    late/masked passes (the concat materializes ~60 MB at sponza caps —
    1.4 ms per pass, trace r5); per-pass entry lists only ever reference
    pass-valid slots, so sharing is exact. Returns (comb (G·R, L), n_row)."""
    g, r = dense["tri_valid"].shape
    _, attrB = pack_gbuffer_coeff_matrix(
        dense["coeffs"], dense["attr_planes"], dense["tri_valid"], consts
    )  # (G·R, 64) f32
    parts = [
        attrB.reshape(g, r, 64),
        dense["coeffs"].reshape(g, r, 15),
        dense["tri_z"][..., None],
        dense["slot_material"].astype(jnp.float32)[..., None],
        dense["slot_instance"].astype(jnp.float32)[..., None],
        dense["packed_id"].astype(jnp.float32)[..., None],  # < 2^24, f32-exact
    ]
    n_row = 0
    if mat_rows is not None:
        n_row = mat_rows.shape[-1]
        rows_m = mat_rows[dense["slot_material"].reshape(-1)].reshape(g, r, n_row)
        parts.append(rows_m)
    lane_w = 64 + 15 + 4 + n_row
    return jnp.concatenate(parts, axis=-1).reshape(g * r, lane_w), n_row


def pack_tile_blocks(
    dense: dict,          # compact_triangles / passthrough_groups output
    entries: Array,       # (T, K2) global flat slot ids or -1 (bin_triangles_per_tile)
    consts: Array | None = None,  # (G, R, 8) or (G, 8) per-slot material constants
    mat_rows: Array | None = None,  # (M, 32) packed material rows (textured)
    comb: tuple[Array, int] | None = None,  # prebuilt build_tile_comb output
):
    """Gather per-(tile, entry) kernel blocks + downstream slot tables.

    ONE combined row gather (gathers price per row — PERF_NOTES) pulls, for
    every dense tile entry: the 64-lane phase-B attribute row, the 15 raster
    plane coefficients, the conservative nearest z, and the slot-table fields
    (material, instance, packed id[, the 32-lane material row]). Everything
    the kernel and the downstream texturing/picking consumers need rides one
    (T·K2)-row gather.

    Returns dict:
      cm_t   (T·ROUNDS·8, 384) f32 — per-(tile, round) plane blocks, rows
             a,b,c(+pad5), lanes [e0·64 | e1·64 | e2·64 | zn·64 | wd·64 | pad]
      attr_t (T·K2, 128) bf16 — hi/lo phase-B rows per entry
      near_r (T, ROUNDS) i32 — suffix-max nearest-z bit patterns per round
      tables (material, instance, packed_id[, rows]) per (tile, entry)
    """
    t_n, k2 = entries.shape
    assert k2 % TILE_ROUND == 0, "k2 must be a multiple of 64"
    rounds = k2 // TILE_ROUND
    if comb is None:
        comb, n_row = build_tile_comb(dense, consts, mat_rows)
    else:
        comb, n_row = comb

    have = entries >= 0
    d = comb[jnp.maximum(entries, 0).reshape(-1)]  # (T·K2, L) — the one gather
    d = jnp.where(have.reshape(-1, 1), d, 0.0)

    attr_e = d[:, 0:64]
    attr_t = pack_attrB_hilo(attr_e)  # (T·K2, 128) bf16

    co = d[:, 64:79]  # (T·K2, 15) plane-major (5 planes × abc)
    # invalid entries must never cover: e0's constant term ≡ -1e30
    co = co.at[:, 2].set(jnp.where(have.reshape(-1), co[:, 2], -1e30))
    co = co.reshape(t_n, rounds, TILE_ROUND, 5, 3)
    cm = jnp.transpose(co, (0, 1, 4, 3, 2)).reshape(t_n, rounds, 3, 5 * TILE_ROUND)
    # rounds ride SUBLANES ((tile·round)·8-row blocks): per-round access in the
    # kernel is a dynamic sublane ref slice at full lane width — Mosaic rejects
    # dynamic LANE slices of values
    cm = jnp.pad(cm, ((0, 0), (0, 0), (0, 5), (0, _RND_LANES - 5 * TILE_ROUND)))
    cm_t = cm.reshape(t_n * rounds * 8, _RND_LANES)

    tz_e = jnp.where(have, d[:, 79].reshape(t_n, k2), -1.0)
    near_round = jnp.max(
        jnp.maximum(tz_e, 0.0).reshape(t_n, rounds, TILE_ROUND), axis=-1
    )
    near_sfx = jnp.flip(jax.lax.cummax(jnp.flip(near_round, axis=1), axis=1), axis=1)
    near_r = jax.lax.bitcast_convert_type(near_sfx, jnp.int32)

    tables = (
        jnp.where(have, d[:, 80].reshape(t_n, k2).astype(jnp.int32), 0).reshape(-1),
        jnp.where(have, d[:, 81].reshape(t_n, k2).astype(jnp.int32), 0).reshape(-1),
        jnp.where(have, d[:, 82].reshape(t_n, k2).astype(jnp.int32), -1).reshape(-1),
    )
    if n_row:
        # f16 material-row table: the per-pixel row gather is TABLE-SIZE bound
        # (f32 390k×32 = 12.4 ms vs f16 2.1 — probe_gather r5); normalized
        # rect coords lose ≤2^-11 relative in f16 = ≤0.31 texel at a 640
        # atlas, inside the 1 px atlas padding and stable under the tap clamps
        tables = tables + (d[:, 83 : 83 + n_row].astype(jnp.float16),)
    return {"cm_t": cm_t, "attr_t": attr_t, "near_r": near_r, "tables": tables}


def _make_tile_kernel(tile: int, k2: int):
    pix = tile * tile
    rounds = k2 // TILE_ROUND

    def _tile_kernel(cnt_ref, tx_ref, near_ref, cm_ref, attr_ref,
                     depth_out, vid_out, gb_out):
        t = pl.program_id(0)
        row = t % ROWG
        tx = tx_ref[0]
        tg = t + tx_ref[1]
        x0 = ((tg % tx) * tile).astype(jnp.float32)
        y0 = ((tg // tx) * tile).astype(jnp.float32)
        pmat16, xl, yl = _pmat16_local(tile)
        px = x0 + xl
        py = y0 + yl

        n = cnt_ref[row, 0]
        rounds_n = (n + TILE_ROUND - 1) // TILE_ROUND
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROUND, pix), 0)
        slot_code = 127 - slot_iota

        def cond_a(carry):
            r0, key, vid = carry
            dmin = jnp.min(key) & ~jnp.int32(127)
            return (r0 < rounds_n) & (
                dmin < near_ref[row, jnp.minimum(r0, rounds - 1)]
            )

        def loop_a(carry):
            r0, key, vid = carry
            # per-round (8, 384) block: dynamic SUBLANE ref slice, full lanes
            blk = _local_hilo16(
                cm_ref[pl.ds((row * rounds + r0) * 8, 8), :], x0, y0
            )  # (16, 384) bf16
            e = jax.lax.dot_general(
                blk, pmat16,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (384, PIX); rows 320:384 are pad
            e0 = e[0 * TILE_ROUND : 1 * TILE_ROUND, :]
            e1 = e[1 * TILE_ROUND : 2 * TILE_ROUND, :]
            e2 = e[2 * TILE_ROUND : 3 * TILE_ROUND, :]
            zn = e[3 * TILE_ROUND : 4 * TILE_ROUND, :]
            wd = e[4 * TILE_ROUND : 5 * TILE_ROUND, :]
            m = jnp.minimum(jnp.minimum(e0, e1), e2)
            q = jnp.minimum(jnp.minimum(m, zn), jnp.minimum(wd - zn, wd - 1e-30))
            cover = q >= 0
            z = zn * (1.0 / jnp.maximum(wd, 1e-30))
            zi = (jax.lax.bitcast_convert_type(z, jnp.int32) & ~jnp.int32(127)) | slot_code
            keyk = jnp.max(jnp.where(cover, zi, -1), axis=0, keepdims=True)
            better = keyk > key
            vid = jnp.where(
                better, tg * 256 + r0 * TILE_ROUND + (127 - (keyk & 127)), vid
            )
            return r0 + 1, jnp.where(better, keyk, key), vid

        key0 = jnp.zeros((1, pix), jnp.int32)
        vid0 = jnp.full((1, pix), -1, jnp.int32)
        r_stop, key, vid = jax.lax.while_loop(
            cond_a, loop_a, (jnp.int32(0), key0, vid0)
        )
        depth = jax.lax.bitcast_convert_type(key & ~jnp.int32(127), jnp.float32)

        def loop_b(r0, carry):
            pa, pc = carry
            blk = attr_ref[pl.ds(row * k2 + r0 * TILE_ROUND, TILE_ROUND), :]
            kye = vid - (tg * 256 + r0 * TILE_ROUND)
            onehot = (slot_iota == kye).astype(jnp.bfloat16)
            sel = jax.lax.dot_general(
                blk, onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, PIX): rows 0:64 hi, 64:128 lo
            a = sel[0:16, :] + sel[64:80, :]
            b = sel[16:32, :] + sel[80:96, :]
            c = sel[32:48, :] + sel[96:112, :]
            cst = sel[48:64, :] + sel[112:128, :]
            attrs = a * px + b * py + c
            mine = (kye >= 0) & (kye < TILE_ROUND)
            return jnp.where(mine, attrs, pa), jnp.where(mine, cst, pc)

        pa, pc = jax.lax.fori_loop(
            0, r_stop, loop_b,
            (jnp.zeros((N_GB_ATTR, pix), jnp.float32),
             jnp.zeros((N_GB_ATTR, pix), jnp.float32)),
        )
        ssb = pa[8:9, :]
        rw = 1.0 / jnp.where(jnp.abs(ssb) > 1e-12, ssb, 1.0)
        depth_out[pl.ds(row, 1), :] = depth
        vid_out[pl.ds(row, 1), :] = vid
        gb_out[pl.ds(row * N_GB_ATTR, 8), :] = (pa[0:8, :] * rw).astype(jnp.bfloat16)
        gb_out[pl.ds(row * N_GB_ATTR + 8, 8), :] = pc[0:8, :].astype(jnp.bfloat16)

    return _tile_kernel


@partial(jax.jit, static_argnames=("width", "height", "tile", "interpret"))
def rasterize_gbuffer_tiles(
    blocks: dict,        # pack_tile_blocks output (cm_t, attr_t, near_r)
    counts: Array,       # (T,) entries per tile (bin_triangles_per_tile)
    width: int,
    height: int,
    tile: int = TILE,
    interpret: bool = False,
    tile_base: Array | int = 0,
):
    """Loop-free per-tile G-buffer raster over dense triangle entry lists.

    Each grid step streams its tile's plane matrix + phase-B rows via
    BlockSpec (no resident whole-scene matrix — the VMEM ceiling that forced
    the old kernel's resident/HBM split disappears), runs ceil(count/64)
    rounds of ONE (16, 384)×(16, PIX) plane matmul + packed-key resolve, with
    a front-to-back early-out between rounds, then gathers the winners'
    attributes per round. vid = (global_tile << 8) | entry, so downstream
    flat = (vid >> 8)·K2 + (vid & 255) indexes the per-(tile, entry) tables
    from pack_tile_blocks. Returns (depth, vid, gbuffer) like
    rasterize_gbuffer_pallas."""
    TILE_, PIX_ = tile, tile * tile
    tx = (width + TILE_ - 1) // TILE_
    ty = (height + TILE_ - 1) // TILE_
    n_tiles = tx * ty
    k2 = blocks["attr_t"].shape[0] // n_tiles
    rounds = k2 // TILE_ROUND

    def pad_rows(a, fill):
        if a.shape[0] % ROWG != 0:
            p = ROWG - a.shape[0] % ROWG
            a = jnp.pad(a, ((0, p), (0, 0)), constant_values=fill)
        return a

    n_tiles_pad = ((n_tiles + ROWG - 1) // ROWG) * ROWG
    cm_t = blocks["cm_t"]
    attr_t = blocks["attr_t"]
    if n_tiles_pad != n_tiles:
        cm_t = jnp.pad(cm_t, ((0, (n_tiles_pad - n_tiles) * rounds * 8), (0, 0)))
        attr_t = jnp.pad(attr_t, ((0, (n_tiles_pad - n_tiles) * k2), (0, 0)))

    depth, vid, gb = pl.pallas_call(
        _make_tile_kernel(TILE_, k2),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWG, 1), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWG, rounds), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWG * rounds * 8, _RND_LANES), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG * k2, 128), lambda t: (t // ROWG, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ROWG, PIX_), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG, PIX_), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG * N_GB_ATTR, PIX_), lambda t: (t // ROWG, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_pad, PIX_), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_pad, PIX_), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles_pad * N_GB_ATTR, PIX_), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pad_rows(counts.astype(jnp.int32)[:, None], 0),
        jnp.stack([jnp.asarray(tx, jnp.int32), jnp.asarray(tile_base, jnp.int32)]),
        pad_rows(blocks["near_r"], 0),
        cm_t, attr_t,
    )

    def untile(a):
        a = a[:n_tiles].reshape(ty, tx, TILE_, TILE_)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE_, tx * TILE_)[:height, :width]

    gbt = gb[: n_tiles * N_GB_ATTR].reshape(ty, tx, N_GB_ATTR, TILE_, TILE_)
    gbt = gbt.transpose(0, 3, 1, 4, 2).reshape(ty * TILE_, tx * TILE_, N_GB_ATTR)
    return untile(depth), untile(vid), gbt[:height, :width]


def gbuffer_from_raster(
    gb: Array, vid: Array, depth: Array, inv_view_proj: Array,
    row_offset: Array | float = 0.0, full_height: int | None = None,
) -> dict[str, Array]:
    """Unpack the kernel's (H, W, 16) bf16 attribute image into the GBuffer dict
    that decode_visbuffer produces (ops/decode3d.py) — no per-pixel gathers.
    Lanes: [nrm xyz, uv, tangent xyz, alb rgb, metallic, roughness, emissive rgb]
    (tangent: per-triangle world tangent, bitangent handedness in |T| — 1 → +1,
    0.5 → −1; T = 0 marks a degenerate UV mapping).
    World position is reconstructed from the f32 depth by unprojecting the
    pixel's NDC through inv_view_proj (the standard deferred-shading trick) —
    interpolating it in bf16 would cost ~0.2 units of error at scene scale."""
    hit = vid >= 0
    hitf = hit[..., None]
    # slice channels BEFORE the f32 convert: a wholesale astype materializes a
    # 132 MB (H, W, 16) f32 copy (0.3 ms — trace); per-channel converts fuse
    # into the consumers
    class _SliceConvert:
        def __getitem__(self, idx):
            return gb[idx].astype(jnp.float32)

    g = _SliceConvert()
    nrm = g[..., 0:3]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    h, w = depth.shape
    fh = full_height if full_height is not None else h  # band sharding: global rows
    ndc_x = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * (2.0 / w) - 1.0
    ndc_y = (
        jnp.asarray(row_offset, jnp.float32)
        + jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    ) * (2.0 / fh) - 1.0
    m = inv_view_proj
    hx = m[0, 0] * ndc_x + m[0, 1] * ndc_y + m[0, 2] * depth + m[0, 3]
    hy = m[1, 0] * ndc_x + m[1, 1] * ndc_y + m[1, 2] * depth + m[1, 3]
    hz = m[2, 0] * ndc_x + m[2, 1] * ndc_y + m[2, 2] * depth + m[2, 3]
    hw = m[3, 0] * ndc_x + m[3, 1] * ndc_y + m[3, 2] * depth + m[3, 3]
    inv_w = 1.0 / jnp.where(jnp.abs(hw) > 1e-12, hw, 1.0)
    wpos = jnp.stack([hx * inv_w, hy * inv_w, hz * inv_w], axis=-1)
    return {
        "hit": hit,
        "world_pos": jnp.where(hitf, wpos, 0.0),
        "normal": jnp.where(hitf, nrm, 0.0),
        "uv": g[..., 3:5],
        "tangent": jnp.where(hitf, g[..., 5:8], 0.0),
        "albedo": jnp.where(hitf, g[..., 8:11], 0.0),
        "metallic": jnp.where(hit, g[..., 11], 0.0),
        "roughness": jnp.where(hit, g[..., 12], 1.0),
        "emissive": jnp.where(hitf, g[..., 13:16], 0.0),
        "occlusion": jnp.ones_like(g[..., 11]),
    }
