"""Packed-tap albedo modulation (the Pallas-path texturing pass) vs the oracle
bilinear sampler (ops/sampling.py::sample_atlas_bilinear used by the XLA decode
path): same rect windows, same wrap, same filtering."""

import numpy as np
import jax.numpy as jnp

from oxylus_tpu.assets.material import Material, pack_materials
from oxylus_tpu.assets.texture import Texture, TextureAtlas
from oxylus_tpu.ops.sampling import (
    pack_albedo_tables,
    pack_atlas_taps,
    sample_albedo_modulation,
    sample_atlas_bilinear,
)


def _setup():
    rng = np.random.default_rng(3)
    atlas = TextureAtlas(size=128)
    for i in range(4):
        px = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
        px[..., 3] = 255
        atlas.add(f"t{i}", Texture(name=f"t{i}", pixels=px.astype(np.uint8)))
    pixels, rects = atlas.build()
    mats = [Material(albedo_texture=f"t{k}") for k in range(4)] + [Material()]
    gpu = pack_materials(mats, rects, 8)
    return jnp.asarray(pixels), gpu


def test_modulation_matches_oracle_sampler():
    atlas, gpu = _setup()
    rng = np.random.default_rng(7)
    h, w = 24, 32
    mat = jnp.asarray(rng.integers(0, 4, (h, w)), jnp.int32)
    # stay a texel away from rect borders: the two samplers clamp the 2x2
    # window identically but tap-vs-window edge rounding differs at the seam
    uv = jnp.asarray(rng.uniform(0.06, 0.94, (h, w, 2)), jnp.float32)

    mat_rows = pack_albedo_tables(gpu)[mat]
    got = sample_albedo_modulation(mat_rows, pack_atlas_taps(atlas), atlas.shape[0], uv)
    want = sample_atlas_bilinear(atlas, gpu.albedo_rect[mat], uv)[..., :3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_modulation_untextured_material_is_identity():
    atlas, gpu = _setup()
    h, w = 8, 8
    mat = jnp.full((h, w), 4, jnp.int32)  # material with no albedo texture
    uv = jnp.full((h, w, 2), 0.4, jnp.float32)
    mat_rows = pack_albedo_tables(gpu)[mat]
    got = sample_albedo_modulation(mat_rows, pack_atlas_taps(atlas), atlas.shape[0], uv)
    np.testing.assert_array_equal(np.asarray(got), 1.0)


def test_modulation_repeat_wrap():
    atlas, gpu = _setup()
    mat = jnp.zeros((2, 2), jnp.int32)
    uv_a = jnp.full((2, 2, 2), 0.25, jnp.float32)
    uv_b = uv_a + 3.0  # repeat wrap: uv + integer == uv
    rows = pack_albedo_tables(gpu)[mat]
    taps = pack_atlas_taps(atlas)
    a = sample_albedo_modulation(rows, taps, atlas.shape[0], uv_a)
    b = sample_albedo_modulation(rows, taps, atlas.shape[0], uv_b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
