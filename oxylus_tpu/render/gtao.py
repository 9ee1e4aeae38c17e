"""Ground-truth ambient occlusion — visibility-bitmask variant (GT-VBAO).

Re-creation of the reference's visibility-bitmask GTAO pass chain
(`/root/reference/Oxylus/src/Render/Shaders/gtao.slang`, driver `Passes/PBR.cpp:143-311`,
XeGTAO-derived): depth prefilter mips → per-pixel hemisphere slices, each carrying
a 32-bit sector occupancy mask over the projected-normal hemisphere arc
(`gtao.slang:105-131`) — every sample marks the angular interval subtended by its
thickness-extruded surface, so visibility behind THIN occluders is recovered (the
failure mode of plain max-horizon GTAO) → edge-aware spatial denoise. Quality
presets = slice/sample counts, RendererCVar defaults: 3 slices × 3 samples,
radius 0.5, thickness 0.25, final power 1.2; noise comes from a per-pixel hash,
the Hilbert-curve LUT analog.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

QUALITY_PRESETS = {0: (1, 2), 1: (2, 2), 2: (3, 3), 3: (3, 3)}  # slices, samples/side


def _acos_fast(x: Array) -> Array:
    """Abramowitz–Stegun 4.4.45 polynomial acos (~1e-3 abs error): the exact
    arccos is a slow transcendental on the VPU and AO only needs arc fractions."""
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 - ax * 0.0187293))
    )
    return jnp.where(x >= 0, p, jnp.pi - p)


def prefilter_depth(depth: Array, mips: int = 5) -> list[Array]:
    """Depth mip chain (`vbgtao_prefilter`): min-reduce for conservative reach."""
    out = [depth]
    cur = depth
    for _ in range(mips - 1):
        if min(cur.shape) < 2:
            break
        h2, w2 = cur.shape[0] // 2 * 2, cur.shape[1] // 2 * 2
        c = cur[:h2, :w2]
        cur = jnp.min(
            jnp.stack([c[0::2, 0::2], c[1::2, 0::2], c[0::2, 1::2], c[1::2, 1::2]]), axis=0
        )
        out.append(cur)
    return out


def _pixel_hash(h: int, w: int, frame: Array) -> Array:
    """Per-pixel rotation noise in [0,1) (Hilbert-LUT analog, R2 sequence per frame)."""
    ys = jax.lax.broadcasted_iota(jnp.uint32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.uint32, (h, w), 1)
    n = xs * jnp.uint32(0x9E3779B9) + ys * jnp.uint32(0x85EBCA6B) + jnp.uint32(frame) * jnp.uint32(0xC2B2AE35)
    n = (n ^ (n >> 16)) * jnp.uint32(0x45D9F3B)
    return (n & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0


@partial(jax.jit, static_argnames=("quality_level",))
def gtao(
    view_pos: Array,    # (H, W, 3) view-space position (z < 0 into the screen)
    view_normal: Array, # (H, W, 3) view-space normal
    hit: Array,         # (H, W)
    frame: Array = 0,
    radius: float = 0.5,
    thickness: float = 0.25,
    final_power: float = 1.2,
    quality_level: int = 3,
) -> Array:
    """Returns AO factor (H, W), 1 = fully open. Screen-space horizon integration."""
    h, w = hit.shape
    n_slices, n_samples = QUALITY_PRESETS.get(quality_level, (3, 3))

    view_dir = -view_pos / jnp.maximum(jnp.linalg.norm(view_pos, axis=-1, keepdims=True), 1e-6)

    # Gather-free sampling (PERF_NOTES.md: one dynamic 2-D gather ≈ 15 ms at 1080p;
    # the original per-pixel-radius march cost 18 of them): taps are FIXED integer
    # screen offsets realized as pad+slice shifts. The horizon math still uses true
    # view-space deltas, so occlusion remains geometrically correct — only the
    # sampling pattern is fixed in screen space (SSAO-style kernel). Per-pixel
    # radius scaling and per-pixel noise rotation trade for a ~10× faster pass.
    import math as _math

    max_px = 24
    pad = jnp.pad(
        view_pos, ((max_px, max_px), (max_px, max_px), (0, 0)), mode="edge"
    )

    def tap(dy, dx):  # static shift of view_pos
        return pad[max_px + dy : max_px + dy + h, max_px + dx : max_px + dx + w]

    # ---- visibility-bitmask accumulation (gtao.slang's sector bitmasks,
    # :105-131): each slice carries an N_SECTORS-bit occupancy mask over the
    # hemisphere arc centred on the projected normal. Every sample inserts the
    # angular interval its thickness-extruded surface subtends — unlike
    # max-horizon scanning, visibility BEHIND a thin occluder is recovered,
    # which is the whole point of the bitmask variant.
    n_bits = 32
    ao_acc = jnp.zeros((h, w))
    nrm = view_normal

    def bits_below(k):  # k (H, W) int32 in [0, 32] → low-k ones
        kk = jnp.clip(k, 0, 32)
        base = (jnp.uint32(1) << jnp.minimum(kk, 31).astype(jnp.uint32)) - jnp.uint32(1)
        return jnp.where(kk >= 32, jnp.uint32(0xFFFFFFFF), base)

    for s in range(n_slices):
        angle = (s + 0.5) * _math.pi / n_slices
        ux, uy = _math.cos(angle), _math.sin(angle)
        # slice tangent in view space (screen x right, y down → view -y up)
        t_scr = jnp.array([ux, -uy, 0.0], jnp.float32)
        t2 = t_scr[None, None, :] - jnp.sum(t_scr * view_dir, axis=-1, keepdims=True) * view_dir
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-6)

        # projected-normal angle γ in the (view_dir, t2) slice frame
        n_v = jnp.sum(nrm * view_dir, axis=-1)
        n_t = jnp.sum(nrm * t2, axis=-1)
        n_len = jnp.sqrt(jnp.maximum(n_v * n_v + n_t * n_t, 1e-12))
        gamma = jnp.sign(n_t) * _acos_fast(jnp.clip(n_v / n_len, -1.0, 1.0))
        arc_lo = gamma - _math.pi / 2  # hemisphere arc of the surface normal

        mask = jnp.zeros((h, w), jnp.uint32)
        for side, sign in enumerate((1.0, -1.0)):
            for i in range(1, n_samples + 1):
                step = max_px * (i / n_samples) ** 1.5
                dx = int(round(ux * step * sign))
                dy = int(round(uy * step * sign))
                if dx == 0 and dy == 0:
                    dx = int(sign)
                sample_pos = tap(dy, dx)
                delta = sample_pos - view_pos
                d2 = jnp.sum(delta * delta, axis=-1)
                rs = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
                dist = d2 * rs
                # front/back angles: surface sample and its thickness extrusion
                # away from the camera (view_dir points TOWARD the camera)
                cos_f = jnp.sum(delta * view_dir, axis=-1) * rs
                delta_b = delta - view_dir * thickness
                rs_b = jax.lax.rsqrt(jnp.maximum(jnp.sum(delta_b * delta_b, axis=-1), 1e-12))
                cos_b = jnp.sum(delta_b * view_dir, axis=-1) * rs_b
                a_f = sign * _acos_fast(jnp.clip(cos_f, -1.0, 1.0))
                a_b = sign * _acos_fast(jnp.clip(cos_b, -1.0, 1.0))
                a_min = jnp.minimum(a_f, a_b)
                a_max = jnp.maximum(a_f, a_b)
                # map the occluded interval into sector space over [γ-π/2, γ+π/2]
                u_lo = (a_min - arc_lo) / _math.pi * n_bits
                u_hi = (a_max - arc_lo) / _math.pi * n_bits
                lo = jnp.floor(u_lo).astype(jnp.int32)
                hi = jnp.ceil(u_hi).astype(jnp.int32)
                seg = bits_below(hi) & ~bits_below(lo)
                in_range = dist < radius
                seg = jnp.where(in_range, seg, jnp.uint32(0))
                mask = mask | seg

        occ = jax.lax.population_count(mask).astype(jnp.float32) / n_bits
        ao_acc = ao_acc + (1.0 - occ)

    ao = ao_acc / n_slices
    ao = jnp.clip(ao, 0.0, 1.0) ** final_power
    return jnp.where(hit, ao, 1.0)


def denoise_ao(ao: Array, depth: Array, sigma_depth: float = 0.05) -> Array:
    """Edge-aware 3×3 blur (`vbgtao_denoise`): weights fall off across depth edges.

    Static pad+slice shifts, NOT index-array taps — advanced indexing lowers to
    gathers (36 of them here ≈ 33 ms at 1080p), while pad+slice fuses into the
    elementwise kernel at bandwidth speed (PERF_NOTES.md)."""
    h, w = ao.shape
    ap = jnp.pad(ao, 1, mode="edge")
    dp = jnp.pad(depth, 1, mode="edge")
    acc = jnp.zeros_like(ao)
    wsum = jnp.zeros_like(ao)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            a = ap[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            d = dp[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            wgt = jnp.exp(-jnp.abs(d - depth) / sigma_depth)
            acc = acc + a * wgt
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-6)
