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

def _raster_kernel(tile_list_ref, tx_ref, coeff_hbm, depth_out, vid_out):
    t = pl.program_id(0)
    n_slots = coeff_hbm.shape[-1] // 4

    def body(coeff_vmem, sem):
        tx = tx_ref[0]
        x0 = ((t % tx) * TILE).astype(jnp.float32)
        y0 = ((t // tx) * TILE).astype(jnp.float32)

        lin = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)[:, 0]
        px = x0 + (lin % TILE).astype(jnp.float32) + 0.5
        py = y0 + (lin // TILE).astype(jnp.float32) + 0.5
        pmat = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (PIX, 3)

        k_cap = tile_list_ref.shape[1]

        def loop(k, carry):
            depth, vid = carry
            vm = tile_list_ref[0, k]

            def hit(carry):
                depth, vid = carry
                dma = pltpu.make_async_copy(coeff_hbm.at[vm], coeff_vmem, sem)
                dma.start()
                dma.wait()
                e = jax.lax.dot_general(
                    pmat,
                    coeff_vmem[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (PIX, 256)
                e0 = e[:, :n_slots]
                e1 = e[:, n_slots : 2 * n_slots]
                e2 = e[:, 2 * n_slots : 3 * n_slots]
                z = e[:, 3 * n_slots :]
                cover = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                zm = jnp.where(cover, z, -1.0)
                best = jnp.max(zm, axis=-1, keepdims=True)  # (PIX, 1)
                arg = jnp.argmax(zm, axis=-1).astype(jnp.int32)[:, None]
                better = best > depth
                pid = (vm << 8) | arg
                return jnp.where(better, best, depth), jnp.where(better, pid, vid)

            return jax.lax.cond(vm >= 0, hit, lambda c: c, (depth, vid))

        depth0 = jnp.zeros((PIX, 1), jnp.float32)
        vid0 = jnp.full((PIX, 1), -1, jnp.int32)
        depth, vid = jax.lax.fori_loop(0, k_cap, loop, (depth0, vid0))
        # outputs stay (PIX, 1) sublane-major — a (1024,1)->(8,128) reshape would be a
        # cross-tile relayout Mosaic rejects
        depth_out[:, :] = depth
        vid_out[:, :] = vid

    pl.run_scoped(
        body,
        pltpu.VMEM((3, 4 * n_slots), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def rasterize_pallas(coeff_mat: Array, tile_list: Array, width: int, height: int, interpret: bool = False):
    tx, ty = _tile_grid(width, height)
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]

    depth, vid = pl.pallas_call(
        _raster_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k_cap), lambda t: (t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # coeff matrices stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_list, jnp.array([tx], jnp.int32), coeff_mat)

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
