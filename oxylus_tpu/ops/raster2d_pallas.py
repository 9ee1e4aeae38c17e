"""Pallas tile kernel for the 2D sprite path: ordered alpha blend in VMEM.

The XLA scan formulation (ops/raster2d.py) re-reads the whole tile framebuffer from HBM
every blend step; this kernel keeps each 32×32 tile's color state in VMEM across its
sprite list — the ROP-loop-in-registers design, one kernel launch per frame.

Performance anatomy (measured on the target chip, see PERF_NOTES.md):
- per-(tile, slot) DMAs serialize at ~15 µs each → all sprite data (records,
  pre-tinted texel planes) is staged resident in VMEM for the whole launch;
- `lax.cond` costs ~1.5 µs per evaluation in a Mosaic loop → the slot loop has NO
  cond: each tile runs a dynamic-trip-count `fori_loop` over exactly its occupancy
  (tile lists are valid-prefix by construction);
- the kernel is lanes-=-pixels oriented: every per-pixel quantity is a (1, PIX) or
  (K, PIX) row, so slicing slot `k` is a dynamic *sublane* ref slice (supported)
  rather than a lane slice of a value (rejected by Mosaic layout inference).

Texture sampling without gathers: each sprite's texture window is pre-resampled into
16×16 RGBA texel planes (one XLA gather per frame), pre-multiplied by the sprite
tint. In-kernel, bilinear filtering is one transposed weight matrix
(256, PIX) = tri(fv-v)⊗tri(fu-u) against the sprite's (8, 256) channel planes on
the MXU — no reshapes (Mosaic rejects in-kernel shape casts).
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
ROWG = 8  # sublane row-group for per-tile blocked inputs


def _blend_kernel(
    tl_ref,      # (ROWG, K) i32 SMEM — per-tile sorted sprite slots (valid prefix)
    cnt_ref,     # (ROWG, 1) i32 SMEM — per-tile occupancy
    tx_ref,      # (1,) i32 SMEM
    fld_ref,     # (ROWG, 10*K) f32 SMEM — field-major per-tile record columns
    tex_ref,     # (S*8, 256) f32 VMEM — channel-planar, pre-tinted texel planes
    color_out,   # (PIX, 4) block
    vid_out,     # (PIX, 1) block
):
    _blend_kernel_common(
        tl_ref, cnt_ref, tx_ref, fld_ref, tex_ref, None, color_out, vid_out
    )


def _blend_kernel_depth(
    tl_ref, cnt_ref, tx_ref, fld_ref, tex_ref,
    sdep_ref,    # (PIX, 1) f32 block — scene reverse-Z depth for this tile
    color_out, vid_out,
):
    _blend_kernel_common(
        tl_ref, cnt_ref, tx_ref, fld_ref, tex_ref, sdep_ref, color_out, vid_out
    )


def _blend_kernel_common(
    tl_ref, cnt_ref, tx_ref, fld_ref, tex_ref, sdep_ref, color_out, vid_out
):
    t = pl.program_id(0)
    row = t % ROWG
    tx = tx_ref[0]
    x0 = ((t % tx) * TILE).astype(jnp.float32)
    y0 = ((t // tx) * TILE).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = x0 + (lin % TILE).astype(jnp.float32) + 0.5  # (1, PIX)
    py = y0 + (lin // TILE).astype(jnp.float32) + 0.5

    k = tl_ref.shape[1]
    n = cnt_ref[row, 0]

    # empty tiles (the common case) write the clear color and skip everything
    # else — including the (256, PIX) bilinear-grid iotas, which at ~1.3 µs/tile
    # were most of the kernel's fixed cost (trace: 6 ms/frame at 1080p)
    color_out[:, :] = jnp.zeros((PIX, 4), jnp.float32)
    vid_out[:, :] = jnp.full((PIX, 1), -1, jnp.int32)

    @pl.when(n > 0)
    def _blend_occupied():
        _blend_tile(
            tl_ref, fld_ref, tex_ref, sdep_ref, color_out, vid_out, row, k, n, px, py
        )


def _blend_tile(tl_ref, fld_ref, tex_ref, sdep_ref, color_out, vid_out, row, k, n, px, py):
    # loop-invariant bilinear grid and channel selectors
    jj = jax.lax.broadcasted_iota(jnp.int32, (TEX * TEX, PIX), 0)
    gv = (jj // TEX).astype(jnp.float32)
    gu = (jj % TEX).astype(jnp.float32)
    sel = [
        (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == c).astype(jnp.float32)
        for c in range(4)
    ]

    # Per-slot setup happens INSIDE the occupancy loop from SMEM scalar field
    # loads (~54 ns each): empty tiles — the common case — cost only the iota
    # setup and output writes. (The earlier design vectorized setup over all K
    # slots into (K, PIX) VMEM scratch per tile: ~2.6 MB of scratch writes per
    # tile whether or not anything was drawn — 9.1 ms/frame at 1080p, trace.)
    # scene reverse-Z depth row for the depth-tested (Forward2D-over-3D) variant
    sdep = None if sdep_ref is None else jnp.swapaxes(sdep_ref[:, :], 0, 1)  # (1, PIX)

    def body(kk, carry):
        cr, cg, cb, ca, vid = carry  # (1, PIX) each
        sid = tl_ref[row, kk]
        # field order: p00x p00y e0x e0y e1x e1y idet cut_eff eid flip [depth]
        p00x = fld_ref[row, 0 * k + kk]
        p00y = fld_ref[row, 1 * k + kk]
        e0x = fld_ref[row, 2 * k + kk]
        e0y = fld_ref[row, 3 * k + kk]
        e1x = fld_ref[row, 4 * k + kk]
        e1y = fld_ref[row, 5 * k + kk]
        idet = fld_ref[row, 6 * k + kk]
        cut = fld_ref[row, 7 * k + kk]
        eid = fld_ref[row, 8 * k + kk]
        flip = fld_ref[row, 9 * k + kk]

        rx = px - p00x  # (1, PIX)
        ry = py - p00y
        lu = (rx * e1y - ry * e1x) * idet
        lv = (ry * e0x - rx * e0y) * idet
        inside = (lu >= 0.0) & (lu <= 1.0) & (lv >= 0.0) & (lv <= 1.0)
        u = lu + flip * (1.0 - 2.0 * lu)  # arithmetic flip (scalar-pred select)
        v = 1.0 - lv
        fu = jnp.clip(u, 0.0, 1.0) * (TEX - 1)
        fv = jnp.clip(v, 0.0, 1.0) * (TEX - 1)

        wgt = jnp.maximum(1.0 - jnp.abs(fv - gv), 0.0) * jnp.maximum(
            1.0 - jnp.abs(fu - gu), 0.0
        )  # (256, PIX)
        texel = jax.lax.dot_general(
            tex_ref[pl.ds(sid * 8, 8), :], wgt,  # (8, 256) · (256, PIX)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, PIX) — rows 0..3 = tinted RGBA
        # channel extraction via one-hot reductions (layout-safe row pulls)
        tr = jnp.sum(texel * sel[0], axis=0, keepdims=True)
        tg = jnp.sum(texel * sel[1], axis=0, keepdims=True)
        tb = jnp.sum(texel * sel[2], axis=0, keepdims=True)
        ta = jnp.sum(texel * sel[3], axis=0, keepdims=True)

        a = ta * inside.astype(jnp.float32)
        a = jnp.where(a < cut, 0.0, a)
        if sdep is not None:
            # depth TEST (no write) against the 3D scene: reverse-Z, the
            # record must be strictly nearer than the opaque surface
            dep = fld_ref[row, 10 * k + kk]
            a = jnp.where(dep > sdep, a, 0.0)

        one_m = 1.0 - a
        new = (
            cr * one_m + tr * a,
            cg * one_m + tg * a,
            cb * one_m + tb * a,
            ca * one_m + a,
            jnp.where(a > 0.5, eid, vid),
        )
        return new

    cr0 = jnp.zeros((1, PIX), jnp.float32)
    vid0 = jnp.full((1, PIX), -1.0, jnp.float32)
    cr, cg, cb, ca, vid = jax.lax.fori_loop(
        0, n, body, (cr0, cr0, cr0, cr0, vid0)
    )

    tp = lambda a: jnp.swapaxes(a, 0, 1)  # (1, PIX) → (PIX, 1)
    color_out[:, :] = jnp.concatenate([tp(cr), tp(cg), tp(cb), tp(ca)], axis=1)
    vid_out[:, :] = tp(vid).astype(jnp.int32)


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def blend_tiles_pallas(
    records: Array,     # (S, 16) f32 sorted sprite records
    textures: Array,    # (S, TEX, TEX, 4) f32 per-sprite texture tiles
    tile_list: Array,   # (T, K) sorted sprite slots, valid prefix then -1
    width: int,
    height: int,
    interpret: bool = False,
    rec_depth: Array | None = None,   # (S,) f32 reverse-Z NDC depth per record
    scene_depth: Array | None = None,  # (H, W) f32 reverse-Z — depth TEST target
) -> tuple[Array, Array]:
    tx = (width + TILE - 1) // TILE
    ty = (height + TILE - 1) // TILE
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    s = records.shape[0]
    with_depth = scene_depth is not None

    cnt = jnp.sum((tile_list >= 0).astype(jnp.int32), axis=1, keepdims=True)  # (T, 1)
    tl_c = jnp.maximum(tile_list, 0)

    # per-tile record fields in ONE row gather (gathers are the costly primitive on
    # this target): build the 10-column field matrix [p00x p00y e0x e0y e1x e1y
    # idet cut_eff eid flip], gather (T, K) rows, lay out field-major (T, C*K) so
    # the kernel slices each field as a static lane range.
    cut_eff = jnp.where(records[:, 12] > 0.5, records[:, 11], -1.0)
    cols = [records[:, 0:7], cut_eff[:, None], records[:, 14:16]]
    if with_depth:
        cols.append(rec_depth[:, None])
    fmat = jnp.concatenate(cols, axis=1)  # (S, 10 [+1])
    n_fld = fmat.shape[1]
    ftile = fmat[tl_c]  # (T, K, C) — the one gather
    # field-major (T, C*K): the kernel reads each field as an SMEM scalar, so no
    # lane-alignment padding is needed
    ftile = ftile.transpose(0, 2, 1).reshape(tile_list.shape[0], n_fld * k_cap)

    # pre-tint texel planes: (V,16,16,4) → where(has_tex, tiles, 1) * tint,
    # channel-planar (V*8, 256) with rows s*8+c = channel c, cols j = v*16+u.
    # textures may cover only the visible prefix (V <= S); tile lists are masked
    # to that prefix by the caller.
    v_cap = textures.shape[0]
    tint = records[:v_cap, 7:11]  # (V, 4)
    has_tex = records[:v_cap, 13] > 0.5
    tinted = jnp.where(has_tex[:, None, None, None], textures, 1.0) * tint[:, None, None, :]
    tex_planes = jnp.pad(
        tinted.transpose(0, 3, 1, 2), ((0, 0), (0, 4), (0, 0), (0, 0))
    ).reshape(v_cap * 8, TEX * TEX)

    def pad_rows(a, fill):
        if a.shape[0] % ROWG != 0:
            pad = ROWG - a.shape[0] % ROWG
            a = jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)
        return a

    tl_p = pad_rows(tile_list, -1)
    cnt_p = pad_rows(cnt, 0)
    ftile = pad_rows(ftile, 0.0)

    in_specs = [
        pl.BlockSpec((ROWG, k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((ROWG, 1), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ROWG, n_fld * k_cap), lambda t: (t // ROWG, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [tl_p, cnt_p, jnp.array([tx], jnp.int32), ftile, tex_planes]
    if with_depth:
        # scene depth in the same (T*PIX, 1) tile-blocked layout as the outputs
        sd = jnp.pad(
            scene_depth,
            ((0, ty * TILE - height), (0, tx * TILE - width)),
            constant_values=0.0,
        )
        sd_blocks = (
            sd.reshape(ty, TILE, tx, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles * PIX, 1)
        )
        in_specs.append(pl.BlockSpec((PIX, 1), lambda t: (t, 0)))
        args.append(sd_blocks)

    color, vid = pl.pallas_call(
        _blend_kernel_depth if with_depth else _blend_kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((PIX, 4), lambda t: (t, 0)),
            pl.BlockSpec((PIX, 1), lambda t: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * PIX, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * PIX, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    def untile(a, ch):
        a = a.reshape(n_tiles, PIX, ch).reshape(ty, tx, TILE, TILE, ch)
        return a.transpose(0, 2, 1, 3, 4).reshape(ty * TILE, tx * TILE, ch)[:height, :width]

    color = untile(color, 4)
    vid = untile(vid, 1)[..., 0]
    return color, vid


MAX_VISIBLE = 1024  # sprites whose texture windows are resampled per frame


def resample_texture_tiles(packed_prefix: Array, atlas: Array) -> Array:
    """Texture tiles from the packed sorted-record matrix (ops/raster2d.py layout:
    cols 21:23 uv_size, 23:25 uv_offset, 25:29 albedo_rect). Capped to the visible
    prefix so per-frame texture work stays bounded regardless of entity capacity.

    The sample grid is SEPARABLE (row index depends only on v, column only on u),
    so for small atlases the (S, TEX, TEX) gather — measured 5–11 ms per frame
    (PERF_NOTES.md) — becomes two one-hot matmuls on the MXU (~0.5 GFLOP)."""
    s = packed_prefix.shape[0]
    a = atlas.shape[0]
    uv_size = packed_prefix[:, 21:23]
    uv_offset = packed_prefix[:, 23:25]
    rect = packed_prefix[:, 25:29]
    us = (jnp.arange(TEX, dtype=jnp.float32)) / (TEX - 1)
    uu = uv_offset[:, None, 0] + us[None, :] * uv_size[:, None, 0]  # (S, TEX)
    vv = uv_offset[:, None, 1] + us[None, :] * uv_size[:, None, 1]
    uu = jnp.mod(uu, 1.0)
    vv = jnp.mod(vv, 1.0)
    ax = (rect[:, None, 0] + uu * (rect[:, None, 2] - rect[:, None, 0])) * a
    ay = (rect[:, None, 1] + vv * (rect[:, None, 3] - rect[:, None, 1])) * a
    ix = jnp.clip(ax.astype(jnp.int32), 0, a - 1)  # (S, TEX) column indices
    iy = jnp.clip(ay.astype(jnp.int32), 0, a - 1)  # (S, TEX) row indices

    if a <= 256:
        lanes = jnp.arange(a, dtype=jnp.int32)
        ry = (iy[:, :, None] == lanes[None, None, :]).astype(jnp.float32)  # (S,TEX,A)
        rx = (ix[:, :, None] == lanes[None, None, :]).astype(jnp.float32)  # (S,TEX,A)
        atl = atlas.astype(jnp.float32) / 255.0  # (A, A, 4)
        # rows: one big matmul (S·TEX, A) @ (A, A·4)
        t1 = jnp.einsum("sra,abk->srbk", ry, atl)     # (S, TEX, A, 4)
        # cols: batched per-sprite contraction
        return jnp.einsum("srbk,scb->srck", t1, rx)   # (S, TEX, TEX, 4)

    # large atlases: the gather wins over O(A) one-hot rows
    return atlas[iy[:, :, None], ix[:, None, :]].astype(jnp.float32) / 255.0


def build_sprite_texture_tiles(materials, atlas: Array) -> Array:
    """Pre-resample each sprite's texture window into a (S, TEX, TEX, 4) array —
    ONE gather over the atlas per frame for all sprites (per-sprite `materials`
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
