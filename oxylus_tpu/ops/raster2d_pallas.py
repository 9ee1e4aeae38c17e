"""Pallas tile kernel for the 2D sprite path: ordered alpha blend in VMEM.

The XLA scan formulation (ops/raster2d.py) re-reads the whole tile framebuffer from HBM
every blend step; this kernel keeps each 32×32 tile's color state in VMEM across its
sprite list — the ROP-loop-in-registers design, one kernel launch per frame.

Texture sampling without gathers: each sprite's texture window is pre-resampled into a
16×16 RGBA tile (one XLA gather per frame for all sprites). In-kernel, bilinear
filtering is expressed as TWO separable weighted contractions — a (PIX, 16) v-weight
matrix times the (16, 16·4) tile on the MXU, then a u-weight contraction on the VPU —
bilinear sampling as matmul, no dynamic indexing at all.

Sprite records are packed (S, 16) f32 rows DMA'd per (tile, slot):
  [0] p00x [1] p00y   screen-space quad origin
  [2] e0x  [3] e0y    screen edge vector (local +x)
  [4] e1x  [5] e1y    screen edge vector (local +y)
  [6] inv_det
  [7..10] tint rgba
  [11] alpha cutoff  [12] is_mask  [13] has_texture  [14] entity_id  [15] flip_x
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 32
PIX = TILE * TILE
TEX = 16  # per-sprite texture tile resolution


def _blend_kernel(tile_list_ref, tx_ref, rec_hbm, tex_hbm, color_out, vid_out):
    t = pl.program_id(0)
    row = t % tile_list_ref.shape[0]  # tile_list is blocked in sublane-aligned row groups

    def body(rec_vmem, tex_vmem, sem_r, sem_t):
        tx = tx_ref[0]
        x0 = ((t % tx) * TILE).astype(jnp.float32)
        y0 = ((t // tx) * TILE).astype(jnp.float32)
        lin = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)[:, 0]
        px = x0 + (lin % TILE).astype(jnp.float32) + 0.5
        py = y0 + (lin // TILE).astype(jnp.float32) + 0.5

        k_cap = tile_list_ref.shape[1]

        def loop(k, carry):
            color, vid = carry  # (PIX, 4), (PIX, 1)
            sid = tile_list_ref[row, k]

            def hit(carry):
                color, vid = carry
                dma_r = pltpu.make_async_copy(rec_hbm.at[pl.ds(sid, 1)], rec_vmem, sem_r)
                dma_r.start()
                # textures are channel-planar (S*8, 256): rows sid*8..+4 = RGBA planes
                # (padded to 8 rows per sprite — DMA row slices need sublane granularity)
                dma_t = pltpu.make_async_copy(tex_hbm.at[pl.ds(sid * 8, 8)], tex_vmem, sem_t)
                dma_t.start()
                dma_r.wait()
                rec = [rec_vmem[0, i] for i in range(16)]  # scalar reads from SMEM

                rx = px - rec[0]
                ry = py - rec[1]
                lu = (rx * rec[5] - ry * rec[4]) * rec[6]
                lv = (ry * rec[2] - rx * rec[3]) * rec[6]
                inside = (lu >= 0.0) & (lu <= 1.0) & (lv >= 0.0) & (lv <= 1.0)

                u = jnp.where(rec[15] > 0.5, 1.0 - lu, lu)
                v = 1.0 - lv

                # full bilinear weight matrix over the flattened (v, u) texel grid —
                # built without reshapes (Mosaic rejects in-kernel shape casts):
                # col j ↦ (v = j // TEX, u = j % TEX), W[p, j] = tri(fv-v) * tri(fu-u)
                fu = jnp.clip(u, 0.0, 1.0) * (TEX - 1)
                fv = jnp.clip(v, 0.0, 1.0) * (TEX - 1)
                j = jax.lax.broadcasted_iota(jnp.int32, (PIX, TEX * TEX), 1)
                gv = (j // TEX).astype(jnp.float32)
                gu = (j % TEX).astype(jnp.float32)
                wgt = jnp.maximum(1.0 - jnp.abs(fv[:, None] - gv), 0.0) * jnp.maximum(
                    1.0 - jnp.abs(fu[:, None] - gu), 0.0
                )  # (PIX, TEX*TEX)

                dma_t.wait()
                texel = jax.lax.dot_general(
                    wgt, tex_vmem[:],  # (PIX, 256) · (8, 256)ᵀ — cols 0..3 = RGBA
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (PIX, 8)
                texel = jnp.where(rec[13] > 0.5, texel, 1.0)

                r = texel[:, 0] * rec[7]
                g = texel[:, 1] * rec[8]
                bl = texel[:, 2] * rec[9]
                a = texel[:, 3] * rec[10]
                a = jnp.where((rec[12] > 0.5) & (a < rec[11]), 0.0, a)
                a = jnp.where(inside, a, 0.0)

                one_m = 1.0 - a
                new_color = jnp.stack(
                    [
                        color[:, 0] * one_m + r * a,
                        color[:, 1] * one_m + g * a,
                        color[:, 2] * one_m + bl * a,
                        color[:, 3] * one_m + a,
                    ],
                    axis=-1,
                )
                new_vid = jnp.where((a > 0.5)[:, None], rec[14].astype(jnp.int32), vid)
                return new_color, new_vid

            return jax.lax.cond(sid >= 0, hit, lambda c: c, (color, vid))

        color0 = jnp.zeros((PIX, 4), jnp.float32)
        vid0 = jnp.full((PIX, 1), -1, jnp.int32)
        color, vid = jax.lax.fori_loop(0, k_cap, loop, (color0, vid0))
        color_out[:, :] = color  # (PIX, 4) — no cross-tile relayout
        vid_out[:, :] = vid

    pl.run_scoped(
        body,
        pltpu.SMEM((1, 128), jnp.float32),  # record row, lane-padded for DMA alignment
        pltpu.VMEM((8, TEX * TEX), jnp.float32),  # channel-planar texel planes (4 used)
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def blend_tiles_pallas(
    records: Array,     # (S, 16) f32 sorted sprite records
    textures: Array,    # (S, TEX, TEX, 4) f32 per-sprite texture tiles
    tile_list: Array,   # (T, K) sorted sprite slots or -1
    width: int,
    height: int,
    interpret: bool = False,
) -> tuple[Array, Array]:
    tx = (width + TILE - 1) // TILE
    ty = (height + TILE - 1) // TILE
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    # TPU block rule: sublane dim must be a multiple of 8 (or the full array), so the
    # tile list is blocked in groups of 8 rows; the kernel picks row `t % 8`.
    row_group = 8 if n_tiles % 8 == 0 or n_tiles > 8 else n_tiles
    if tile_list.shape[0] % row_group != 0:
        pad = row_group - tile_list.shape[0] % row_group
        tile_list = jnp.pad(tile_list, ((0, pad), (0, 0)), constant_values=-1)

    color, vid = pl.pallas_call(
        _blend_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((row_group, k_cap), lambda t: (t // row_group, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((PIX, 4), lambda t: (t, 0)),
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * PIX, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_list, jnp.array([tx], jnp.int32),
      jnp.pad(records, ((0, 0), (0, 128 - records.shape[1]))),
      # (S, 16, 16, 4) → channel-planar (S*8, 256): row s*8+c is channel c, j = v*16+u
      jnp.pad(textures.transpose(0, 3, 1, 2), ((0, 0), (0, 4), (0, 0), (0, 0))
              ).reshape(textures.shape[0] * 8, TEX * TEX))

    def untile(a, ch):
        a = a.reshape(n_tiles, PIX, ch).reshape(ty, tx, TILE, TILE, ch)
        return a.transpose(0, 2, 1, 3, 4).reshape(ty * TILE, tx * TILE, ch)[:height, :width]

    color = untile(color, 4)
    vid = untile(vid, 1)[..., 0]
    return color, vid


def build_sprite_texture_tiles(materials, atlas: Array) -> Array:
    """Pre-resample each sprite's texture window into a (S, TEX, TEX, 4) array —
    ONE gather over the atlas per frame for every sprite (per-sprite `materials`
    views, so animated UV windows are already folded into uv_size/uv_offset)."""
    s = materials.flags.shape[0]
    a = atlas.shape[0]
    us = (jnp.arange(TEX, dtype=jnp.float32)) / (TEX - 1)
    # local uv grid → material uv transform → atlas rect
    uu = materials.uv_offset[:, None, None, 0] + us[None, None, :] * materials.uv_size[:, None, None, 0]
    vv = materials.uv_offset[:, None, None, 1] + us[None, :, None] * materials.uv_size[:, None, None, 1]
    uu = jnp.mod(uu, 1.0)
    vv = jnp.mod(vv, 1.0)
    rect = materials.albedo_rect  # (S, 4)
    ax = (rect[:, None, None, 0] + uu * (rect[:, None, None, 2] - rect[:, None, None, 0])) * a
    ay = (rect[:, None, None, 1] + vv * (rect[:, None, None, 3] - rect[:, None, None, 1])) * a
    ix = jnp.clip(ax.astype(jnp.int32), 0, a - 1)
    iy = jnp.clip(ay.astype(jnp.int32), 0, a - 1)
    tiles = atlas[iy, ix].astype(jnp.float32) / 255.0  # (S, TEX, TEX, 4)
    return tiles
