"""Texture sampling ops: bilinear/nearest atlas fetch.

The atlas array is this engine's bindless texture table (see `assets/texture.py`).
All samplers work on normalized *texture-local* UVs plus an atlas rect (u0,v0,u1,v1);
wrap modes follow the reference `SamplingMode` (`Asset/Material.hpp:15-22`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _wrap_uv(uv: Array, mode: Array) -> Array:
    """mode 0/4: repeat, 1/3: clamp (REFERENCE: Linear/Nearest × Repeated/Clamped)."""
    repeat = jnp.mod(uv, 1.0)
    clamp = jnp.clip(uv, 0.0, 1.0)
    is_clamp = (mode == 1) | (mode == 3)
    return jnp.where(is_clamp[..., None], clamp, repeat)


def sample_atlas_bilinear(atlas: Array, rect: Array, uv: Array, sampling_mode: Array | None = None) -> Array:
    """Bilinearly sample the RGBA8 atlas.

    atlas: (A, A, 4) uint8;  rect: (..., 4) normalized window;  uv: (..., 2) local UVs.
    Returns (..., 4) float32 in [0, 1].
    """
    a = atlas.shape[0]
    if sampling_mode is None:
        sampling_mode = jnp.zeros(uv.shape[:-1], jnp.int32)
    uv = _wrap_uv(uv, sampling_mode)

    u0, v0, u1, v1 = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    # map local uv into atlas pixel space (rect is [x0,y0,x1,y1] normalized; u→x, v→y)
    px = (u0 + uv[..., 0] * (u1 - u0)) * a - 0.5
    py = (v0 + uv[..., 1] * (v1 - v0)) * a - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    # clamp taps inside the rect window so bilinear never bleeds across atlas neighbors
    rx0 = jnp.ceil(u0 * a - 0.5)
    ry0 = jnp.ceil(v0 * a - 0.5)
    rx1 = jnp.floor(u1 * a - 0.5)
    ry1 = jnp.floor(v1 * a - 0.5)

    def tap(xi, yi):
        x = jnp.clip(xi, rx0, rx1).astype(jnp.int32)
        y = jnp.clip(yi, ry0, ry1).astype(jnp.int32)
        x = jnp.clip(x, 0, a - 1)
        y = jnp.clip(y, 0, a - 1)
        return atlas[y, x].astype(jnp.float32) / 255.0

    nearest = (sampling_mode == 2) | (sampling_mode == 3)
    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    bilinear = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    near = tap(jnp.round(px), jnp.round(py))
    return jnp.where(nearest[..., None], near, bilinear)


def f32_to_sortable_u32(x: Array) -> Array:
    """Map float32 to u32 preserving total order (the sprite sort-key bit trick,
    reference `SceneGPU.hpp:366-404`)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = bits >> 31
    flip = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return bits ^ flip
