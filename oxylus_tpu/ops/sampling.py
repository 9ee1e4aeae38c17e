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


def pack_albedo_tables(materials) -> Array:
    """(M, 16) f32 per-material row for the one-gather modulation path:
    lanes [uv_size(2) | uv_offset(2) | albedo_rect(4) | has_albedo | pad×7].
    Folding every per-material field into ONE row matrix means the per-pixel
    material lookup costs one row gather instead of five (gathers price per
    gathered ROW on this target — PERF_NOTES.md)."""
    has = ((materials.flags & 1) > 0).astype(jnp.float32)  # FLAG_HAS_ALBEDO
    m = materials.flags.shape[0]
    return jnp.concatenate(
        [
            materials.uv_size, materials.uv_offset, materials.albedo_rect,
            has[:, None], jnp.zeros((m, 7), jnp.float32),
        ],
        axis=-1,
    )


def pack_atlas_taps(atlas: Array) -> Array:
    """(A*A, 16) f32: each texel row carries its 2×2 bilinear neighborhood
    [c00 rgba | c10 | c01 | c11] (edge-clamped shifted copies — fused
    elementwise) so a bilinear sample costs ONE row gather instead of four."""
    a = atlas.astype(jnp.float32) / 255.0  # (A, A, 4)
    right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    down = jnp.concatenate([a[1:], a[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate([a, right, down, down_right], axis=-1)  # (A, A, 16)
    return packed.reshape(-1, 16)


def sample_albedo_modulation(
    mat_rows: Array,    # (h, w, 16) per-pixel gathered pack_albedo_tables rows
    atlas_taps: Array,  # (A*A, 16) from pack_atlas_taps
    atlas_size: int,
    uv: Array,          # (h, w, 2) interpolated surface UVs
) -> Array:
    """Per-pixel albedo texture factor (h, w, 3); 1.0 where the material has no
    albedo texture. REPEAT wrap; bilinear via the packed 2×2 taps (one gather)."""
    a = atlas_size
    uv_t = uv * mat_rows[..., 0:2] + mat_rows[..., 2:4]
    uvw = uv_t - jnp.floor(uv_t)  # repeat
    rect = mat_rows[..., 4:8]
    px = (rect[..., 0] + uvw[..., 0] * (rect[..., 2] - rect[..., 0])) * a - 0.5
    py = (rect[..., 1] + uvw[..., 1] * (rect[..., 3] - rect[..., 1])) * a - 0.5
    # keep the 2×2 window inside the rect so bilinear never bleeds across
    # atlas neighbors (same clamp as sample_atlas_bilinear's per-tap clamp),
    # then re-derive the fractional weights against the clamped corner
    rx0 = jnp.ceil(rect[..., 0] * a - 0.5)
    ry0 = jnp.ceil(rect[..., 1] * a - 0.5)
    rx1 = jnp.floor(rect[..., 2] * a - 0.5)
    ry1 = jnp.floor(rect[..., 3] * a - 0.5)
    x0 = jnp.clip(jnp.clip(jnp.floor(px), rx0, rx1 - 1.0), 0, a - 2)
    y0 = jnp.clip(jnp.clip(jnp.floor(py), ry0, ry1 - 1.0), 0, a - 2)
    fx = jnp.clip(px - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(py - y0, 0.0, 1.0)[..., None]
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    taps = atlas_taps[(yi * a + xi).reshape(-1)].reshape(uv.shape[:-1] + (16,))
    rgb = (
        taps[..., 0:3] * (1 - fx) * (1 - fy)
        + taps[..., 4:7] * fx * (1 - fy)
        + taps[..., 8:11] * (1 - fx) * fy
        + taps[..., 12:15] * fx * fy
    )
    has = mat_rows[..., 8:9] > 0.5
    return jnp.where(has, rgb, 1.0)


def f32_to_sortable_u32(x: Array) -> Array:
    """Map float32 to u32 preserving total order (the sprite sort-key bit trick,
    reference `SceneGPU.hpp:366-404`)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = bits >> 31
    flip = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return bits ^ flip
