"""Post-processing stack as fused fullscreen array ops.

Reference pass semantics pinned from SURVEY A.5/A.6 and the pass drivers
(`/root/reference/Oxylus/src/Render/Passes/PostProcess.cpp`):

- auto-exposure: 256-bin log2-luminance histogram, dark-bin-0 excluded, EV100 exposure
  with exponential temporal adaptation (`histogram_average.slang:22-51`),
- bloom: bright-pass prefilter with soft knee → downsample mip chain → upsample+blend
  (`PostProcess.cpp:79-205`),
- tonemap: ACES fitted / AgX / GT7 + chromatic aberration + film grain + vignette in
  one pass (`tonemap.slang`),
- FXAA: luminance-based edge blend (`fxaa` pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

HISTOGRAM_BINS = 256


# ---------------------------------------------------------------------------
# Auto exposure
# ---------------------------------------------------------------------------

def luminance(rgb: Array) -> Array:
    return rgb[..., 0] * 0.2127 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


def luminance_histogram(hdr: Array, min_log2: Array, inv_log2_range: Array) -> Array:
    """256-bin log-luminance histogram (`histogram_generate` pass). Bin 0 collects
    below-threshold pixels (excluded from the average)."""
    lum = luminance(hdr)
    log_lum = jnp.log2(jnp.maximum(lum, 1e-9))
    t = jnp.clip((log_lum - min_log2) * inv_log2_range, 0.0, 1.0)
    bins = jnp.where(lum < 1e-4, 0, (t * 254.0 + 1.0).astype(jnp.int32))
    # compare-and-reduce instead of scatter-add: scatters serialize on TPU
    # (a 2M-pixel .at[].add was ~45 ms at 1080p; the fused 256-lane compare
    # streams at VPU speed)
    lanes = jnp.arange(HISTOGRAM_BINS, dtype=jnp.int32)
    return jnp.sum(
        (bins.reshape(-1, 1) == lanes[None, :]).astype(jnp.int32), axis=0
    )


def adapt_exposure(
    histogram: Array,
    prev_luminance: Array,
    dt: Array,
    min_exposure: float = -11.5,
    max_exposure: float = 18.0,
    adaptation_speed: float = 1.1,
    ev100_bias: float = 1.0,
) -> tuple[Array, Array]:
    """`histogram_average.slang:22-51`: weighted-average bin → desired luminance →
    exponential adaptation → exposure multiplier. Returns (exposure, new_luminance)."""
    counts = histogram.astype(jnp.float32)
    total = jnp.maximum(jnp.sum(counts[1:]), 1.0)
    weighted = jnp.sum(counts * jnp.arange(HISTOGRAM_BINS, dtype=jnp.float32))
    avg_bin = weighted / total - 1.0
    log2_range = max_exposure - min_exposure
    desired = jnp.exp2(avg_bin / 254.0 * log2_range + min_exposure)
    time_coeff = 1.0 - jnp.exp(-dt * adaptation_speed)
    new_lum = prev_luminance + (desired - prev_luminance) * time_coeff
    ev100 = jnp.log2(jnp.maximum(new_lum, 1e-9) * 100.0 * ev100_bias / 12.5)
    exposure = 1.0 / (jnp.exp2(ev100) * 1.2)
    return exposure, new_lum


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def _downsample2x(img: Array) -> Array:
    # 2×2 box filter via reduce_window: the four-strided-slice form lowered to
    # row gathers on the tiled image layout (~ms each at 1080p; imgops.py)
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
    ) * 0.25


def _upsample2x(img: Array, target_hw: tuple[int, int]) -> Array:
    th, tw = target_hw
    # bilinear up (the reference's up-chain samples bilinearly, PostProcess.cpp)
    return jax.image.resize(img, (th, tw, img.shape[2]), method="linear")


def apply_bloom(
    hdr: Array,
    threshold: float = 1.0,
    soft_threshold: float = 0.125,
    intensity: float = 0.1,
    clamp_value: float = 4.0,
    mips: int = 5,
) -> Array:
    """Prefilter → down chain → up chain blend (`PostProcess.cpp:79-205`)."""
    lum = luminance(hdr)[..., None]
    knee = threshold * soft_threshold
    soft = jnp.clip(lum - threshold + knee, 0.0, 2.0 * knee)
    soft = soft * soft / jnp.maximum(4.0 * knee, 1e-5)
    contribution = jnp.maximum(soft, lum - threshold) / jnp.maximum(lum, 1e-5)
    pre = jnp.minimum(hdr * contribution, clamp_value)

    # the chain runs at half resolution like the reference's bloom
    # (`PostProcess.cpp:79-205` — "half-res, mip count from extent"); full-res
    # strided resamples are the expensive part on this target
    chain = [_downsample2x(pre)]
    for _ in range(mips - 1):
        if min(chain[-1].shape[:2]) < 4:
            break
        chain.append(_downsample2x(chain[-1]))
    acc = chain[-1]
    for i in range(len(chain) - 2, -1, -1):
        acc = chain[i] + _upsample2x(acc, chain[i].shape[:2])
    acc = _upsample2x(acc, hdr.shape[:2])
    return hdr + acc * (intensity / max(len(chain) + 1, 1))


# ---------------------------------------------------------------------------
# Tonemapping (tonemap.slang)
# ---------------------------------------------------------------------------

_ACES_IN = jnp.array(
    [[0.59719, 0.35458, 0.04823], [0.07600, 0.90834, 0.01566], [0.02840, 0.13383, 0.83777]],
    jnp.float32,
)
_ACES_OUT = jnp.array(
    [[1.60475, -0.53108, -0.07367], [-0.10208, 1.10813, -0.00605], [-0.00327, -0.07276, 1.07602]],
    jnp.float32,
)


def _mat3(m, c):
    """Per-pixel 3x3 color-matrix transform as fused elementwise math — the
    (..., 3) @ (3, 3) einsum compiles to a pathologically-shaped matmul on this
    target (~29 ms at 1080p; this form is bandwidth-speed)."""
    return jnp.stack(
        [
            c[..., 0] * m[0, 0] + c[..., 1] * m[0, 1] + c[..., 2] * m[0, 2],
            c[..., 0] * m[1, 0] + c[..., 1] * m[1, 1] + c[..., 2] * m[1, 2],
            c[..., 0] * m[2, 0] + c[..., 1] * m[2, 1] + c[..., 2] * m[2, 2],
        ],
        axis=-1,
    )


def tonemap_aces(c: Array) -> Array:
    v = _mat3(_ACES_IN, c)
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    v = a / jnp.maximum(b, 1e-9)
    return jnp.clip(_mat3(_ACES_OUT, v), 0.0, 1.0)


_AGX_IN = jnp.array(
    [[0.842479, 0.0784336, 0.0792237], [0.0423282, 0.878469, 0.0791661], [0.0423756, 0.0784336, 0.879142]],
    jnp.float32,
)
_AGX_OUT = jnp.array(
    [[1.19688, -0.0980209, -0.0990297], [-0.0528969, 1.15190, -0.0989612], [-0.0529716, -0.0980435, 1.15107]],
    jnp.float32,
)


def _agx_sigmoid(x: Array) -> Array:
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


def tonemap_agx(c: Array, look_saturation: float = 1.3) -> Array:
    """AgX with punchy-look saturation (tonemap.slang:74-120; EV range [-12.47, 4.03])."""
    v = _mat3(_AGX_IN, c)
    min_ev, max_ev = -12.47393, 4.026069
    v = jnp.clip(jnp.log2(jnp.maximum(v, 1e-10)), min_ev, max_ev)
    v = (v - min_ev) / (max_ev - min_ev)
    v = _agx_sigmoid(v)
    lum = luminance(v)[..., None]
    v = lum + look_saturation * (v - lum)
    v = _mat3(_AGX_OUT, v)
    return jnp.clip(v, 0.0, 1.0)


def tonemap_gt7(c: Array) -> Array:
    """Gran Turismo-style filmic curve (GT7 preset)."""
    p, a, m, l, cc, b = 1.0, 1.0, 0.22, 0.4, 1.33, 0.0
    l0 = (p - m) * l / a
    s0 = m + l0
    s1 = m + a * l0
    c2 = a * p / (p - s1)
    w0 = 1.0 - jax.nn.sigmoid((c - m) * 10.0)
    toe = m * jnp.maximum(c / jnp.maximum(m, 1e-5), 1e-5) ** cc
    shoulder = p - (p - s1) * jnp.exp(-c2 * (c - s0) / p)
    linear = m + a * (c - m)
    out = jnp.where(c < m, toe, jnp.where(c < s0, linear, shoulder))
    return jnp.clip(out, 0.0, 1.0)


def apply_tonemap(
    hdr: Array,
    tonemapper: int | Array = 0,
    exposure: Array | float = 1.0,
    gamma: float = 2.2,
    chromatic_aberration: float = 0.0,
    film_grain: float = 0.0,
    film_grain_scale: float = 0.7,
    vignette: float = 0.0,
    frame: Array | int = 0,
) -> Array:
    """Final color pass: exposure → CA → tonemap → vignette → grain → gamma.
    tonemapper: 0 None(+gamma) 1 ACES 2 AgX 3 GT7 (GPU::TonemapType order)."""
    h, w = hdr.shape[:2]
    c = hdr * exposure

    if chromatic_aberration:
        # radial RGB shift (tonemap.slang CA)
        yy = (jnp.arange(h, dtype=jnp.float32) / h - 0.5)[:, None]
        xx = (jnp.arange(w, dtype=jnp.float32) / w - 0.5)[None, :]
        shift = (chromatic_aberration * 8.0 * jnp.stack([xx + 0.0 * yy, yy + 0.0 * xx], -1)).astype(jnp.int32)
        ix = jnp.clip(jnp.arange(w)[None, :] + shift[..., 0], 0, w - 1)
        iy = jnp.clip(jnp.arange(h)[:, None] + shift[..., 1], 0, h - 1)
        r = c[iy, ix, 0]
        b_ix = jnp.clip(jnp.arange(w)[None, :] - shift[..., 0], 0, w - 1)
        b_iy = jnp.clip(jnp.arange(h)[:, None] - shift[..., 1], 0, h - 1)
        b = c[b_iy, b_ix, 2]
        c = jnp.stack([r, c[..., 1], b], axis=-1)

    t = jnp.asarray(tonemapper)
    mapped = jax.lax.switch(
        jnp.clip(t, 0, 3),
        [lambda x: jnp.clip(x, 0.0, 1.0), tonemap_aces, tonemap_agx, tonemap_gt7],
        c,
    )

    if vignette:
        yy = (jnp.arange(h, dtype=jnp.float32) / h - 0.5)[:, None]
        xx = (jnp.arange(w, dtype=jnp.float32) / w - 0.5)[None, :]
        d = jnp.sqrt(xx * xx + yy * yy) * 2.0
        vig = jnp.clip(1.0 - vignette * d * d, 0.0, 1.0)
        mapped = mapped * vig[..., None]

    if film_grain:
        key = jax.random.fold_in(jax.random.PRNGKey(0x617), jnp.asarray(frame) % 16)
        gh = max(int(h * film_grain_scale), 1)
        gw = max(int(w * film_grain_scale), 1)
        noise = jax.random.uniform(key, (gh, gw, 1)) - 0.5
        noise = jnp.resize(noise, (h, w, 1))
        mapped = jnp.clip(mapped + noise * film_grain * 0.15, 0.0, 1.0)

    return jnp.clip(mapped, 0.0, 1.0) ** (1.0 / gamma)


# ---------------------------------------------------------------------------
# FXAA
# ---------------------------------------------------------------------------

def apply_fxaa(ldr: Array, span_max: float = 2.0) -> Array:
    """Luma-gradient directional blur on edges (console-FXAA shape).

    Gather-free: per-pixel dynamic bilinear fetches cost ~17 ms each on this target
    (PERF_NOTES.md), so the directional taps are built from the 9 one-pixel static
    shifts of the image — exact bilinear for offsets within ±1 px, which bounds the
    effective span to 2 px (long-edge quality trades for a ~15× faster pass)."""
    lum = luminance(ldr)
    pad = jnp.pad(lum, 1, mode="edge")
    nw = pad[:-2, :-2]
    ne = pad[:-2, 2:]
    sw = pad[2:, :-2]
    se = pad[2:, 2:]
    m = lum

    lmin = jnp.minimum(m, jnp.minimum(jnp.minimum(nw, ne), jnp.minimum(sw, se)))
    lmax = jnp.maximum(m, jnp.maximum(jnp.maximum(nw, ne), jnp.maximum(sw, se)))

    dir_x = -((nw + ne) - (sw + se))
    dir_y = (nw + sw) - (ne + se)
    dir_reduce = jnp.maximum((nw + ne + sw + se) * 0.25 * 0.125, 1.0 / 128.0)
    rcp = 1.0 / (jnp.minimum(jnp.abs(dir_x), jnp.abs(dir_y)) + dir_reduce)
    dx = jnp.clip(dir_x * rcp, -span_max, span_max)
    dy = jnp.clip(dir_y * rcp, -span_max, span_max)

    h, w = lum.shape
    padc = jnp.pad(ldr, ((1, 1), (1, 1), (0, 0)), mode="edge")
    sh = lambda sy, sx: padc[1 + sy : 1 + sy + h, 1 + sx : 1 + sx + w]

    # the filter only ever uses sample(+s) + sample(-s): summed over both signs,
    # the sign-selected neighbor pairs collapse to sign-FREE sums (one diagonal
    # select instead of 3 selects × 4 calls) — ~2× fewer full-res color ops
    pair_y = sh(1, 0) + sh(-1, 0)
    pair_x = sh(0, 1) + sh(0, -1)
    same_sign = (dx * dy >= 0)[..., None]
    pair_d = jnp.where(same_sign, sh(1, 1) + sh(-1, -1), sh(1, -1) + sh(-1, 1))

    def sym_sample(scale):
        ay = jnp.clip(jnp.abs(dy) * scale, 0.0, 1.0)[..., None]
        ax = jnp.clip(jnp.abs(dx) * scale, 0.0, 1.0)[..., None]
        return (
            ldr * ((1 - ay) * (1 - ax))
            + pair_y * (0.5 * ay * (1 - ax))
            + pair_x * (0.5 * (1 - ay) * ax)
            + pair_d * (0.5 * ay * ax)
        )

    a = sym_sample(0.1666)
    b = a * 0.5 + sym_sample(0.5) * 0.5
    blum = luminance(b)
    use_a = (blum < lmin) | (blum > lmax)
    out = jnp.where(use_a[..., None], a, b)
    edge = (lmax - lmin) > jnp.maximum(0.0312, lmax * 0.125)
    return jnp.where(edge[..., None], out, ldr)
