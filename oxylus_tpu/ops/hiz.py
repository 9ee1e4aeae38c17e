"""Hierarchical-Z pyramid + occlusion testing (reverse-Z).

Re-implements the reference's HiZ generation (single-dispatch SPD-style downsample,
`/root/reference/Oxylus/src/Render/Passes/CullGeometry.cpp:10-59`, ≤13 mips) and the
mip-selected occlusion test (`Shaders/cull.slang:87-134`): reverse-Z means the pyramid
reduces with **min** (farthest visible surface); an object whose conservative nearest
depth is ≤ the stored min over its footprint is occluded.

Pyramid levels are a static list (count fixed by resolution at trace time); the
two-pass early/late protocol lives in the renderer, carrying the previous frame's
pyramid in render state like the reference keeps its persistent HiZ image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_MIPS = 13


def _pad_pow2(depth: Array) -> Array:
    h, w = depth.shape
    ph = 1 << (h - 1).bit_length()
    pw = 1 << (w - 1).bit_length()
    if ph != h or pw != w:
        # pad with far plane (reverse-Z far = 0 → min-reduce keeps it conservative:
        # padded texels read as "far", never occluding)
        depth = jnp.pad(depth, ((0, ph - h), (0, pw - w)), constant_values=0.0)
    return depth


def build_hiz(depth: Array, max_mips: int = MAX_MIPS) -> list[Array]:
    """Mip chain of min-reduced depth. mips[0] is the padded full-res depth.

    On TPU the whole pyramid is two Pallas dispatches (the reference's
    single-dispatch SPD shape, `CullGeometry.cpp:10-59`) — the naive XLA chain
    is ~50 strided-slice ops ≈ 17 ms at 1080p (PERF_NOTES.md)."""
    if jax.devices()[0].platform in ("tpu", "axon"):
        return build_hiz_pallas(depth, max_mips)
    base = _pad_pow2(depth)
    mips = [base]
    cur = base
    while min(cur.shape) > 1 and len(mips) < max_mips:
        h, w = cur.shape
        cur = jnp.min(
            jnp.stack(
                [cur[0::2, 0::2], cur[1::2, 0::2], cur[0::2, 1::2], cur[1::2, 1::2]],
                axis=0,
            ),
            axis=0,
        )
        mips.append(cur)
    return mips


# ---------------------------------------------------------------------------
# Pallas SPD pyramid
# ---------------------------------------------------------------------------

SPD_TILE_H = 128
SPD_TILE_W = 512  # lane dims must stay divisible by 128 after halving
SPD_LEVELS = 2    # levels emitted by the tiled kernel; the tail kernel finishes


def _sel_mats(n: int, half: int):
    """Even/odd column-selection matrices (n, half): S_even[2j, j] = 1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, half), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, half), 1)
    even = (rows == 2 * cols).astype(jnp.float32)
    odd = (rows == 2 * cols + 1).astype(jnp.float32)
    return even, odd


def _min_downsample(cur: Array) -> Array:
    """2× min-downsample via 4 selection matmuls (exact: one weight-1.0 entry
    per output) — Mosaic has no strided value slices, and the MXU makes the
    even/odd extraction free compared to per-element shuffles."""
    hcur, wcur = cur.shape
    hh, wh = (hcur + 1) // 2, (wcur + 1) // 2
    ce, co = _sel_mats(wcur, wh)
    col_min = jnp.minimum(
        jax.lax.dot_general(cur, ce, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot_general(cur, co, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),
    )  # (hcur, wh)  — note: odd-width tail pairs with 0 (far) = conservative
    re, ro = _sel_mats(hcur, hh)
    return jnp.minimum(
        jax.lax.dot_general(re, col_min, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),
        jax.lax.dot_general(ro, col_min, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),
    )  # (hh, wh)


def _spd_tile_kernel(depth_ref, *outs):
    cur = depth_ref[...]
    for k in range(SPD_LEVELS):
        cur = _min_downsample(cur)
        outs[k][...] = cur


def _spd_tail_kernel(mip_ref, *outs):
    cur = mip_ref[...]
    for k in range(len(outs)):
        cur = _min_downsample(cur)
        outs[k][...] = cur


def build_hiz_pallas(depth: Array, max_mips: int = MAX_MIPS) -> list[Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = depth.shape
    hp = -(-h // SPD_TILE_H) * SPD_TILE_H
    wp = -(-w // SPD_TILE_W) * SPD_TILE_W
    if (hp, wp) != (h, w):
        depth = jnp.pad(depth, ((0, hp - h), (0, wp - w)), constant_values=0.0)

    ty, tx = hp // SPD_TILE_H, wp // SPD_TILE_W

    def _tile_index(t_):
        return (t_ // tx, t_ % tx)

    out_shapes = [
        jax.ShapeDtypeStruct((hp >> k, wp >> k), jnp.float32)
        for k in range(1, SPD_LEVELS + 1)
    ]
    out_specs = [
        pl.BlockSpec((SPD_TILE_H >> k, SPD_TILE_W >> k), _tile_index)
        for k in range(1, SPD_LEVELS + 1)
    ]
    mips = [depth] + list(
        pl.pallas_call(
            _spd_tile_kernel,
            grid=(ty * tx,),
            in_specs=[
                pl.BlockSpec((SPD_TILE_H, SPD_TILE_W), _tile_index)
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
        )(depth)
    )

    # tail: the remaining levels fit one block — a second single-step dispatch
    cur = mips[-1]
    tail_shapes = []
    th, tw = cur.shape
    while min(th, tw) > 1 and len(mips) + len(tail_shapes) < max_mips:
        th, tw = (th + 1) // 2, (tw + 1) // 2
        tail_shapes.append(jax.ShapeDtypeStruct((th, tw), jnp.float32))
    if tail_shapes:
        mips += list(
            pl.pallas_call(
                _spd_tail_kernel,
                out_shape=tail_shapes,
            )(cur)
        )
    return mips


def occlusion_test(
    mips: list[Array],
    xmin: Array,
    xmax: Array,
    ymin: Array,
    ymax: Array,
    nearest_depth: Array,
    width: int,
    height: int,
) -> Array:
    """Batched conservative visibility: True = possibly visible.

    Inputs are screen-space pixel AABBs (N,) and each object's *nearest* (max,
    reverse-Z) depth. Mip selected so the footprint spans ≤ 2×2 texels; the 4-texel min
    is the farthest stored depth over the footprint; visible iff nearest_depth >= min
    (object is nearer than or equal to everything rendered there) — cull.slang:87-134.
    """
    base_w = mips[0].shape[1]

    xmin_c = jnp.clip(xmin, 0.0, width - 1.0)
    xmax_c = jnp.clip(xmax, 0.0, width - 1.0)
    ymin_c = jnp.clip(ymin, 0.0, height - 1.0)
    ymax_c = jnp.clip(ymax, 0.0, height - 1.0)

    size = jnp.maximum(xmax_c - xmin_c, ymax_c - ymin_c)
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(size, 1.0))).astype(jnp.int32), 0, len(mips) - 1
    )

    # ONE flattened pyramid + 4 taps total: sampling each level separately costs
    # 4 gathers × 13 levels ≈ 17 ms/frame at these capacities (PERF_NOTES.md);
    # the per-object level parameters (offset/width/height) select with fused
    # elementwise compares instead
    flat = jnp.concatenate([m.reshape(-1) for m in mips])
    off = 0
    base_off = jnp.zeros_like(level)
    mip_w = jnp.zeros_like(level)
    mip_h = jnp.zeros_like(level)
    for lvl, m in enumerate(mips):
        sel = level == lvl
        base_off = jnp.where(sel, off, base_off)
        mip_w = jnp.where(sel, m.shape[1], mip_w)
        mip_h = jnp.where(sel, m.shape[0], mip_h)
        off += m.size

    scale = jnp.exp2(-level.astype(jnp.float32))
    x0 = jnp.clip(jnp.floor(xmin_c * scale).astype(jnp.int32), 0, mip_w - 1)
    y0 = jnp.clip(jnp.floor(ymin_c * scale).astype(jnp.int32), 0, mip_h - 1)
    x1 = jnp.minimum(x0 + 1, mip_w - 1)
    y1 = jnp.minimum(y0 + 1, mip_h - 1)
    t00 = flat[base_off + y0 * mip_w + x0]
    t01 = flat[base_off + y0 * mip_w + x1]
    t10 = flat[base_off + y1 * mip_w + x0]
    t11 = flat[base_off + y1 * mip_w + x1]
    farthest = jnp.minimum(jnp.minimum(t00, t01), jnp.minimum(t10, t11))

    return nearest_depth >= farthest
