import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.render.postfx import (
    HISTOGRAM_BINS,
    adapt_exposure,
    apply_bloom,
    apply_fxaa,
    apply_tonemap,
    luminance_histogram,
    tonemap_aces,
    tonemap_agx,
)


def test_histogram_shape_and_dark_bin():
    img = jnp.zeros((16, 16, 3), jnp.float32)
    hist = luminance_histogram(img, jnp.float32(-11.5), jnp.float32(1 / 29.5))
    assert hist.shape == (HISTOGRAM_BINS,)
    assert int(hist[0]) == 256  # all dark pixels in bin 0


def test_histogram_bright():
    img = jnp.ones((8, 8, 3), jnp.float32)
    hist = luminance_histogram(img, jnp.float32(-11.5), jnp.float32(1 / 29.5))
    assert int(hist[0]) == 0
    assert int(hist.sum()) == 64


def test_exposure_adaptation_converges():
    img = jnp.ones((8, 8, 3), jnp.float32) * 0.5
    hist = luminance_histogram(img, jnp.float32(-11.5), jnp.float32(1 / 29.5))
    lum = jnp.float32(1.0)
    for _ in range(200):
        exposure, lum = adapt_exposure(hist, lum, jnp.float32(1 / 30))
    # adapted luminance should approach scene luminance (0.5) within histogram quantization
    assert 0.3 < float(lum) < 0.8
    assert float(exposure) > 0.0


def test_tonemap_ranges():
    hdr = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (8, 8, 3)), jnp.float32)
    for tm in (tonemap_aces, tonemap_agx):
        out = np.asarray(tm(hdr))
        assert out.min() >= 0.0 and out.max() <= 1.0
    # black maps to black, bright clips toward white
    assert float(tonemap_aces(jnp.zeros((1, 1, 3)))[0, 0, 0]) < 0.01
    assert float(tonemap_aces(jnp.full((1, 1, 3), 100.0))[0, 0, 0]) > 0.95


def test_apply_tonemap_switch():
    hdr = jnp.ones((4, 4, 3), jnp.float32)
    for tm in range(4):
        out = np.asarray(apply_tonemap(hdr, tonemapper=tm))
        assert out.shape == (4, 4, 3)
        assert np.all(out >= 0) and np.all(out <= 1)


def test_bloom_spreads_highlight():
    img = jnp.zeros((32, 32, 3), jnp.float32).at[16, 16].set(jnp.array([50.0, 50.0, 50.0]))
    out = np.asarray(apply_bloom(img, intensity=0.5))
    # neighborhood of the highlight gains energy
    assert out[16, 18, 0] > 0.01
    assert out[16, 16, 0] >= 50.0  # original stays


def test_bloom_below_threshold_noop():
    img = jnp.full((16, 16, 3), 0.2, jnp.float32)
    out = np.asarray(apply_bloom(img, threshold=1.0, intensity=0.5))
    np.testing.assert_allclose(out, 0.2, atol=1e-3)


def test_fxaa_smooths_diagonal_staircase():
    # jagged diagonal edge: FXAA blurs along the local edge direction, producing
    # intermediate values at the staircase corners; flat regions stay untouched
    img = np.zeros((16, 16, 3), np.float32)
    for y in range(16):
        img[y, : y + 1] = 1.0
    out = np.asarray(apply_fxaa(jnp.asarray(img)))
    assert np.all(out[2:, 0] == 1.0)  # solid side untouched
    assert np.all(out[:14, 15] == 0.0)  # empty side untouched
    diag = np.array([out[y, y + 1, 0] for y in range(1, 14)])
    assert ((diag > 0.01) & (diag < 0.99)).any()


def test_vignette_darkens_corners():
    img = jnp.ones((32, 32, 3), jnp.float32)
    out = np.asarray(apply_tonemap(img, tonemapper=0, vignette=0.8))
    assert out[0, 0, 0] < out[16, 16, 0]
