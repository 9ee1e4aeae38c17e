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
    x0 = ((t % tx) * TILE).astype(jnp.float32)
    y0 = ((t // tx) * TILE).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = x0 + (lin % TILE).astype(jnp.float32) + 0.5  # (1, PIX)
    py = y0 + (lin // TILE).astype(jnp.float32) + 0.5

    # pmat8 (8, PIX): rows [x, y, 1, 0…] — contracted against the 8-row-padded
    # coefficient block so e = cmᵀ · pmat lands slots-on-sublanes
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, PIX), 0)
    pmat8 = jnp.where(rid == 0, px, jnp.where(rid == 1, py, jnp.where(rid == 2, 1.0, 0.0)))

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_slots, PIX), 0)
    n = cnt_ref[row, 0]

    def loop(k, carry):
        depth, vid = carry  # (1, PIX) f32 / i32
        vm = tile_list_ref[row, k]
        blk = coeff_ref[pl.ds(vm * 8, 8), :]  # (8, 4R)
        e = jax.lax.dot_general(
            blk, pmat8,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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
def rasterize_pallas(coeff_mat: Array, tile_list: Array, width: int, height: int, interpret: bool = False):
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
    )(pad_rows(tl_c, 0), pad_rows(cnt, 0), jnp.array([tx], jnp.int32), coeff_pad)

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

N_GB_PLANES = 22   # e0 e1 e2 zn wd | ss, [wpos xyz, wnrm xyz, uv] | 8 material consts
N_GB_ATTR = 16     # per-pixel G-buffer lanes emitted by the kernel


def pack_gbuffer_coeff_matrix(
    coeffs: Array,       # (VM, R, 5, 3) from setup_triangles
    attr_planes: Array,  # (VM, R, 9, 3) from setup_triangles: ss + 8 raw attrs
    tri_valid: Array,    # (VM, R)
    mat_consts: Array,   # (VM, 8) per-meshlet material constants
) -> Array:
    """(VM, 3, 22R) plane-major matmul matrix for the G-buffer raster kernel.

    Plane order: e0 e1 e2 zn wd (as pack_coeff_matrix), then ss = Σeᵢ and the 8
    attribute planes Σaᵢ·eᵢ (perspective-correct attr = plane/ss), then 8 constant
    planes (a=b=0, c=material constant) so the kernel's single matmul also
    broadcasts per-meshlet material parameters — replacing the reference's
    per-pixel visbuffer_decode.slang material fetch."""
    vm, r = coeffs.shape[0], coeffs.shape[1]
    zero = jnp.zeros((vm, r, 8, 1), coeffs.dtype)
    cplanes = jnp.concatenate(
        [zero, zero, jnp.broadcast_to(mat_consts[:, None, :, None], (vm, r, 8, 1))],
        axis=-1,
    )  # (VM, R, 8, 3)
    allp = jnp.concatenate([coeffs, attr_planes, cplanes], axis=2)  # (VM, R, 22, 3)
    allp = jnp.moveaxis(allp, 3, 1)       # (VM, 3, R, 22)
    allp = jnp.swapaxes(allp, 2, 3)       # (VM, 3, 22, R)
    return allp.reshape(vm, 3, N_GB_PLANES * r)


def _gbuffer_kernel(
    tile_list_ref, cnt_ref, tx_ref, coeff_hbm, depth_out, vid_out, gb_out, buf, sem
):
    """_raster_kernel extended with winner-attribute selection: the same matmul
    evaluates all 21 planes; the winning slot's attribute rows are pulled with
    masked reductions and carried per pixel; perspective division by the 1/w plane
    happens once at the end.

    The 21-plane coefficient matrix is too big for VMEM (~350 MB at the default
    capacities), so it stays in HBM and each meshlet's (8, 21R) block is DMA'd with
    double buffering — the k+1 fetch is issued before computing k, hiding the
    ~15 µs serial DMA latency that killed the first 2D-kernel design."""
    t = pl.program_id(0)
    row = t % ROWG
    n_slots = coeff_hbm.shape[-1] // N_GB_PLANES
    k_cap = tile_list_ref.shape[1]

    tx = tx_ref[0]
    x0 = ((t % tx) * TILE).astype(jnp.float32)
    y0 = ((t // tx) * TILE).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = x0 + (lin % TILE).astype(jnp.float32) + 0.5
    py = y0 + (lin // TILE).astype(jnp.float32) + 0.5
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, PIX), 0)
    pmat8 = jnp.where(rid == 0, px, jnp.where(rid == 1, py, jnp.where(rid == 2, 1.0, 0.0)))

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_slots, PIX), 0)
    n = cnt_ref[row, 0]
    n_attr = N_GB_PLANES - 5  # ss + 8 perspective attrs + 8 consts

    def fetch(k, par):
        vm = tile_list_ref[row, jnp.minimum(k, k_cap - 1)]
        cp = pltpu.make_async_copy(
            coeff_hbm.at[pl.ds(vm * 8, 8), :],
            buf.at[pl.ds(par * 8, 8), :],
            sem.at[par],
        )
        cp.start()
        return cp

    # a lax.cond costs ~1.5 µs but an unconditional 86 KB fetch on every (mostly
    # empty) tile costs far more — guard the initial fetch on occupancy
    jax.lax.cond(n > 0, lambda: fetch(0, 0) and None, lambda: None)

    def loop(k, carry):
        depth, vid = carry[0], carry[1]
        attrs = carry[2:]
        par = k % 2
        # prefetch k+1 into the other buffer before waiting on k (clamped: the
        # last iteration re-fetches its own block, which is then drained below)
        fetch(jnp.minimum(k + 1, n - 1), 1 - par)
        pltpu.make_async_copy(
            coeff_hbm.at[pl.ds(0, 8), :], buf.at[pl.ds(par * 8, 8), :], sem.at[par]
        ).wait()
        blk = buf[pl.ds(par * 8, 8), :]
        e = jax.lax.dot_general(
            blk, pmat8,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (22R, PIX)
        e0 = e[0:n_slots, :]
        e1 = e[n_slots : 2 * n_slots, :]
        e2 = e[2 * n_slots : 3 * n_slots, :]
        zn = e[3 * n_slots : 4 * n_slots, :]
        wd = e[4 * n_slots : 5 * n_slots, :]
        cover = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (wd > 0) & (zn >= 0) & (zn <= wd)
        z = zn / jnp.where(wd > 0, wd, 1.0)
        zm = jnp.where(cover, z, -1.0)
        best = jnp.max(zm, axis=0, keepdims=True)
        arg = jnp.min(
            jnp.where(zm >= best, slot_iota, jnp.int32(1 << 20)), axis=0, keepdims=True
        )
        winner = slot_iota == arg
        better = best > depth
        vm = tile_list_ref[row, k]
        pid = vm * 256 + arg
        new = [
            jnp.where(better, best, depth),
            jnp.where(better, pid, vid),
        ]
        for i in range(n_attr):
            rows = e[(5 + i) * n_slots : (6 + i) * n_slots, :]
            val = jnp.sum(jnp.where(winner, rows, 0.0), axis=0, keepdims=True)
            new.append(jnp.where(better, val, attrs[i]))
        return tuple(new)

    depth0 = jnp.zeros((1, PIX), jnp.float32)
    vid0 = jnp.full((1, PIX), -1, jnp.int32)
    init = (depth0, vid0) + tuple(jnp.zeros((1, PIX), jnp.float32) for _ in range(n_attr))
    out = jax.lax.fori_loop(0, n, loop, init)
    # drain the one outstanding prefetch (issued for slot n, parity n % 2);
    # nothing was ever fetched for empty tiles
    jax.lax.cond(
        n > 0,
        lambda: pltpu.make_async_copy(
            coeff_hbm.at[pl.ds(0, 8), :], buf.at[pl.ds((n % 2) * 8, 8), :], sem.at[n % 2]
        ).wait(),
        lambda: None,
    )
    depth, vid = out[0], out[1]
    ssum = out[2]       # Σeᵢ of the winning slot
    persp = out[3:11]   # wpos xyz, wnrm xyz, uv — stored as Σaᵢ·eᵢ
    consts = out[11:19]  # material constants

    rw = 1.0 / jnp.where(jnp.abs(ssum) > 1e-12, ssum, 1.0)
    # row writes into the 8-tile output blocks, keeping the kernel's (1, PIX)
    # lanes-major layout — the old per-tile transposes to (PIX, 1/16) columns
    # were the dominant fixed cost of empty tiles
    depth_out[pl.ds(row, 1), :] = depth
    vid_out[pl.ds(row, 1), :] = vid
    for i, p in enumerate(persp):
        gb_out[pl.ds(row * N_GB_ATTR + i, 1), :] = p * rw
    for i, c in enumerate(consts):
        gb_out[pl.ds(row * N_GB_ATTR + 8 + i, 1), :] = c


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def rasterize_gbuffer_pallas(
    coeff_mat: Array, tile_list: Array, width: int, height: int, interpret: bool = False
):
    """Returns (depth (H,W), vid (H,W) i32, gbuffer (H,W,16)) — lanes
    [wpos xyz, wnrm xyz, uv, alb rgb, metallic, roughness, emissive rgb]."""
    tx, ty = _tile_grid(width, height)
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    vm = coeff_mat.shape[0]

    coeff_pad = jnp.pad(coeff_mat, ((0, 0), (0, 5), (0, 0))).reshape(vm * 8, -1)
    k_coeff = coeff_mat.shape[-1] // N_GB_PLANES  # raster slots per meshlet
    cnt = jnp.sum((tile_list >= 0).astype(jnp.int32), axis=1, keepdims=True)
    tl_c = jnp.maximum(tile_list, 0)

    def pad_rows(a, fill):
        if a.shape[0] % ROWG != 0:
            p = ROWG - a.shape[0] % ROWG
            a = jnp.pad(a, ((0, p), (0, 0)), constant_values=fill)
        return a

    n_tiles_pad = ((n_tiles + ROWG - 1) // ROWG) * ROWG
    depth, vid, gb = pl.pallas_call(
        _gbuffer_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWG, k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWG, 1), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # 21-plane matrix stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG, PIX), lambda t: (t // ROWG, 0)),
            pl.BlockSpec((ROWG * N_GB_ATTR, PIX), lambda t: (t // ROWG, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_pad, PIX), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles_pad * N_GB_ATTR, PIX), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, N_GB_PLANES * k_coeff), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pad_rows(tl_c, 0), pad_rows(cnt, 0), jnp.array([tx], jnp.int32), coeff_pad)

    def untile(a):
        a = a[:n_tiles].reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    # gb rows are (tile-major × 16 attrs): (T*16, PIX) → (H, W, 16)
    gbt = gb[: n_tiles * N_GB_ATTR].reshape(ty, tx, N_GB_ATTR, TILE, TILE)
    gbt = gbt.transpose(0, 3, 1, 4, 2).reshape(ty * TILE, tx * TILE, N_GB_ATTR)
    return untile(depth), untile(vid), gbt[:height, :width]


def gbuffer_from_raster(gb: Array, vid: Array) -> dict[str, Array]:
    """Unpack the kernel's (H, W, 16) attribute image into the GBuffer dict that
    decode_visbuffer produces (ops/decode3d.py) — no per-pixel gathers."""
    hit = vid >= 0
    hitf = hit[..., None]
    nrm = gb[..., 3:6]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    return {
        "hit": hit,
        "world_pos": jnp.where(hitf, gb[..., 0:3], 0.0),
        "normal": jnp.where(hitf, nrm, 0.0),
        "uv": gb[..., 6:8],
        "albedo": jnp.where(hitf, gb[..., 8:11], 0.0),
        "metallic": jnp.where(hit, gb[..., 11], 0.0),
        "roughness": jnp.where(hit, gb[..., 12], 1.0),
        "emissive": jnp.where(hitf, gb[..., 13:16], 0.0),
        "occlusion": jnp.ones_like(gb[..., 11]),
    }
