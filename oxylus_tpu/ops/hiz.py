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
    """Mip chain of min-reduced depth. mips[0] is the padded full-res depth."""
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

    # gather the 2×2 neighborhood at each object's level; evaluate all levels and
    # select (static level count keeps this a handful of fused gathers)
    def sample_level(mip: Array, lvl: int) -> Array:
        scale = 1.0 / (1 << lvl)
        x0 = jnp.floor(xmin_c * scale).astype(jnp.int32)
        y0 = jnp.floor(ymin_c * scale).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, mip.shape[1] - 1)
        y1 = jnp.minimum(y0 + 1, mip.shape[0] - 1)
        x0 = jnp.clip(x0, 0, mip.shape[1] - 1)
        y0 = jnp.clip(y0, 0, mip.shape[0] - 1)
        return jnp.minimum(
            jnp.minimum(mip[y0, x0], mip[y0, x1]), jnp.minimum(mip[y1, x0], mip[y1, x1])
        )

    farthest = sample_level(mips[0], 0)
    for lvl in range(1, len(mips)):
        farthest = jnp.where(level == lvl, sample_level(mips[lvl], lvl), farthest)

    return nearest_depth >= farthest
