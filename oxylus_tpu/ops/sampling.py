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


def pack_atlas_taps(atlas: Array, dtype=jnp.float32) -> Array:
    """(A*A, 16) rows: each texel carries its 2×2 bilinear neighborhood
    [c00 rgba | c10 | c01 | c11] (edge-clamped shifted copies — fused
    elementwise) so a bilinear sample costs ONE row gather instead of four.
    `dtype=bfloat16` halves the table (a 1024² atlas is 67 MB in f32, and the
    per-pixel gather into it is table-residency-bound — probe_gather r5);
    8-bit-sourced texels lose <0.4% in bf16, invisible after shading."""
    a = atlas.astype(jnp.float32) / 255.0  # (A, A, 4)
    right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    down = jnp.concatenate([a[1:], a[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate([a, right, down, down_right], axis=-1)  # (A, A, 16)
    return packed.reshape(-1, 16).astype(dtype)


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


def pack_material_tables(materials) -> Array:
    """(M, 32) f32 per-material row for the full-texture production path —
    one row gather per pixel resolves EVERY texture's rect + presence flag
    (reference `visbuffer_decode.slang:185-193` samples albedo/normal/
    emissive/MR/occlusion per pixel; lanes here):
      0:2  uv_size        2:4  uv_offset
      4:8  albedo_rect    8    has_albedo
      9:13 normal_rect    13   has_normal
      14:18 mr_rect       18   has_mr
      19:23 emissive_rect 23   has_emissive
      24   occ_from_mr (occlusion texture present AND shares the MR rect —
           the glTF convention; a distinct occlusion rect would need a 5th
           gather and is sampled on the XLA decode path only)
      25   alpha_cutoff   26   is_alpha_mask
      27:32 pad"""
    from ..assets.material import (
        FLAG_ALPHA_MASK,
        FLAG_HAS_ALBEDO,
        FLAG_HAS_EMISSIVE,
        FLAG_HAS_METALLIC_ROUGHNESS,
        FLAG_HAS_NORMAL,
        FLAG_HAS_OCCLUSION,
    )

    f = materials.flags
    m = f.shape[0]

    def has(bit):
        return ((f & bit) > 0).astype(jnp.float32)[:, None]

    occ_shared = jnp.all(
        jnp.abs(materials.occlusion_rect - materials.mr_rect) < 1e-6, axis=-1
    ).astype(jnp.float32)[:, None]
    return jnp.concatenate(
        [
            materials.uv_size, materials.uv_offset,
            materials.albedo_rect, has(FLAG_HAS_ALBEDO),
            materials.normal_rect, has(FLAG_HAS_NORMAL),
            materials.mr_rect, has(FLAG_HAS_METALLIC_ROUGHNESS),
            materials.emissive_rect, has(FLAG_HAS_EMISSIVE),
            has(FLAG_HAS_OCCLUSION) * occ_shared,
            materials.alpha_cutoff[:, None],
            has(FLAG_ALPHA_MASK),
            jnp.zeros((m, 5), jnp.float32),
        ],
        axis=-1,
    )


def _tap_rect(atlas_taps: Array, atlas_size: int, rect: Array, uvw: Array):
    """One packed-2×2 bilinear tap for an arbitrary atlas rect. uvw is the
    wrapped (repeat) material-space UV. Returns (taps (..., 16), fx, fy)."""
    a = atlas_size
    px = (rect[..., 0] + uvw[..., 0] * (rect[..., 2] - rect[..., 0])) * a - 0.5
    py = (rect[..., 1] + uvw[..., 1] * (rect[..., 3] - rect[..., 1])) * a - 0.5
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
    taps = atlas_taps[(yi * a + xi).reshape(-1)].reshape(uvw.shape[:-1] + (16,))
    return taps, fx, fy


def _bilerp4(taps: Array, fx: Array, fy: Array) -> Array:
    """(…, 4) rgba from the packed 2×2 tap row."""
    return (
        taps[..., 0:4] * (1 - fx) * (1 - fy)
        + taps[..., 4:8] * fx * (1 - fy)
        + taps[..., 8:12] * (1 - fx) * fy
        + taps[..., 12:16] * fx * fy
    )


def sample_material_textures(
    mat_rows: Array,    # (..., 32) per-pixel gathered pack_material_tables rows
    atlas_taps: Array,  # (A*A, 16) from pack_atlas_taps
    atlas_size: int,
    uv: Array,          # (..., 2) interpolated surface UVs
    features: tuple = ("albedo", "normal", "mr", "emissive"),
) -> dict[str, Array]:
    """Sample every material texture at the given UVs through the packed-taps
    row-gather machinery (gathers price per gathered ROW — PERF_NOTES.md —
    so each texture costs ONE gather). `features` gates each texture's gather
    at trace time: scenes without e.g. normal maps pay nothing for them.

    Returns dict with neutral defaults where a texture is absent:
      albedo_rgb (…,3)=1, alpha (…,1)=1, normal_ts (…,3)=(0,0,1),
      mr (…,2)=1 [metallic=B, roughness=G per glTF], occlusion (…,1)=1,
      emissive_rgb (…,3)=1."""
    uv_t = uv * mat_rows[..., 0:2] + mat_rows[..., 2:4]
    uvw = uv_t - jnp.floor(uv_t)  # repeat wrap
    one = jnp.ones(uv.shape[:-1] + (1,), jnp.float32)
    out = {
        "albedo_rgb": jnp.concatenate([one, one, one], axis=-1),
        "alpha": one,
        "normal_ts": jnp.concatenate([0.0 * one, 0.0 * one, one], axis=-1),
        "mr": jnp.concatenate([one, one], axis=-1),
        "occlusion": one,
        "emissive_rgb": jnp.concatenate([one, one, one], axis=-1),
    }
    if "albedo" in features:
        taps, fx, fy = _tap_rect(atlas_taps, atlas_size, mat_rows[..., 4:8], uvw)
        rgba = _bilerp4(taps, fx, fy)
        has = mat_rows[..., 8:9] > 0.5
        out["albedo_rgb"] = jnp.where(has, rgba[..., 0:3], 1.0)
        out["alpha"] = jnp.where(has, rgba[..., 3:4], 1.0)
    if "normal" in features:
        taps, fx, fy = _tap_rect(atlas_taps, atlas_size, mat_rows[..., 9:13], uvw)
        rgb = _bilerp4(taps, fx, fy)[..., 0:3]
        has = mat_rows[..., 13:14] > 0.5
        # standard 3-component +Y-up tangent-space encoding (the reference's
        # two-component / flip-Y variants exist for BC5-swizzled sources,
        # visbuffer_decode.slang:160-170; this atlas stores RGBA8 as-authored)
        out["normal_ts"] = jnp.where(has, rgb * 2.0 - 1.0, out["normal_ts"])
    if "mr" in features:
        taps, fx, fy = _tap_rect(atlas_taps, atlas_size, mat_rows[..., 14:18], uvw)
        rgba = _bilerp4(taps, fx, fy)
        has = mat_rows[..., 18:19] > 0.5
        # glTF: metallic = B, roughness = G, occlusion (when shared) = R
        out["mr"] = jnp.where(
            has, jnp.concatenate([rgba[..., 2:3], rgba[..., 1:2]], axis=-1), 1.0
        )
        out["occlusion"] = jnp.where(mat_rows[..., 24:25] > 0.5, rgba[..., 0:1], 1.0)
    if "emissive" in features:
        taps, fx, fy = _tap_rect(atlas_taps, atlas_size, mat_rows[..., 19:23], uvw)
        rgb = _bilerp4(taps, fx, fy)[..., 0:3]
        has = mat_rows[..., 23:24] > 0.5
        out["emissive_rgb"] = jnp.where(has, rgb, 1.0)
    return out


def perturb_normal(normal: Array, tangent_enc: Array, normal_ts: Array) -> Array:
    """Apply a sampled tangent-space normal to the interpolated shading normal
    using the per-triangle tangent from the attribute planes (handedness in
    |T|: 1 → +1, 0.5 → −1; T = 0 → no tangent frame, keep the normal).
    Gram-Schmidt re-orthogonalizes T against the interpolated normal per pixel
    — the reference's screen-space frame does the same projection
    (visbuffer_decode.slang:137-139)."""
    n = normal
    t_len = jnp.linalg.norm(tangent_enc, axis=-1, keepdims=True)
    has_t = t_len > 0.25
    w_hand = jnp.where(t_len < 0.75, -1.0, 1.0)
    t = tangent_enc / jnp.maximum(t_len, 1e-20)
    t = t - jnp.sum(t * n, axis=-1, keepdims=True) * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = w_hand * jnp.cross(n, t)
    np_ = (
        normal_ts[..., 0:1] * t + normal_ts[..., 1:2] * b + normal_ts[..., 2:3] * n
    )
    np_ = np_ / jnp.maximum(jnp.linalg.norm(np_, axis=-1, keepdims=True), 1e-20)
    return jnp.where(has_t, np_, n)


def f32_to_sortable_u32(x: Array) -> Array:
    """Map float32 to u32 preserving total order (the sprite sort-key bit trick,
    reference `SceneGPU.hpp:366-404`)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = bits >> 31
    flip = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return bits ^ flip
