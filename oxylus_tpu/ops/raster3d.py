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

TILE = 32
PIX = TILE * TILE  # 1024


def pack_coeff_matrix(coeffs: Array, tri_valid: Array) -> Array:
    """(VM, R, 12) → (VM, 3, 4R) matmul-ready: rows (a,b,c), cols plane-major
    [e0·R | e1·R | e2·R | z·R]. Invalid triangles get e0 ≡ -∞ so they never cover.
    R is the raster-slot count (2× meshlet tris after near clipping)."""
    vm, r = coeffs.shape[0], coeffs.shape[1]
    c = coeffs.reshape(vm, r, 4, 3)  # (VM, slot, plane, abc)
    c = jnp.moveaxis(c, 3, 1)  # (VM, abc, slot, plane)
    c = jnp.swapaxes(c, 2, 3)  # (VM, 3, 4, R)
    # kill invalid tris: set edge0 constant to -inf (c row, plane 0)
    kill = ~tri_valid  # (VM, R)
    c = c.at[:, 2, 0, :].set(jnp.where(kill, -1e30, c[:, 2, 0, :]))
    return c.reshape(vm, 3, 4 * r)


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
        cm = coeff_mat[jnp.maximum(vm, 0)]  # (T, 3, 4R)
        r = cm.shape[-1] // 4
        e = jnp.einsum("tpc,tcq->tpq", pmat, cm)  # (T, PIX, 4R)
        e0, e1, e2, z = e[..., :r], e[..., r : 2 * r], e[..., 2 * r : 3 * r], e[..., 3 * r :]
        cover = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & live[:, None, None]
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
    n_slots = coeff_ref.shape[-1] // 4  # 4R columns per meshlet; rows padded to 8

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
        )  # (4R, PIX) — plane-major rows: e0 | e1 | e2 | z
        e0 = e[0:n_slots, :]
        e1 = e[n_slots : 2 * n_slots, :]
        e2 = e[2 * n_slots : 3 * n_slots, :]
        z = e[3 * n_slots :, :]
        cover = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
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
    # outputs transposed to (PIX, 1) sublane-major — a (1024,1)->(8,128) reshape
    # would be a cross-tile relayout Mosaic rejects
    depth_out[:, :] = jnp.swapaxes(depth, 0, 1)
    vid_out[:, :] = jnp.swapaxes(vid, 0, 1)


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
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pad_rows(tl_c, 0), pad_rows(cnt, 0), jnp.array([tx], jnp.int32), coeff_pad)

    def untile(a):
        a = a.reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    return untile(depth.reshape(n_tiles, PIX)), untile(vid.reshape(n_tiles, PIX))


def rasterize(coeff_mat: Array, tile_list: Array, width: int, height: int):
    """Dispatch: Pallas on TPU, reference elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return rasterize_pallas(coeff_mat, tile_list, width, height)
    return rasterize_reference(coeff_mat, tile_list, width, height)
