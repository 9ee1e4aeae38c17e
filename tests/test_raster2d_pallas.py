"""Pallas 2D blend kernel vs the XLA reference path (interpret mode)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.material import Material, pack_materials
from oxylus_tpu.assets.texture import Texture, TextureAtlas
from oxylus_tpu.render.renderer2d import SpriteBatchBindings, default_bindings
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render2d import _ortho_cam, sprite_scene, H, W


def render_both(state, bindings):
    """Render via XLA reference and via pallas-interpret, return both."""
    from oxylus_tpu.ops import raster2d
    from oxylus_tpu.ops.raster2d_pallas import blend_tiles_pallas

    # monkey-wire: call rasterize_sprites twice with use_pallas toggled; for the
    # pallas path we substitute interpret=True by wrapping blend_tiles_pallas
    import oxylus_tpu.ops.raster2d_pallas as rp

    orig = rp.blend_tiles_pallas
    rp.blend_tiles_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        from oxylus_tpu.render.renderer2d import render_2d

        cam = _ortho_cam()
        ref = render_2d(state, cam, bindings, width=W, height=H)
        # force pallas path
        import functools

        pal = raster2d.rasterize_sprites(
            world=state.world,
            material_idx=jnp.arange(state.alive.shape[0], dtype=jnp.int32),
            entity_id=jnp.arange(state.alive.shape[0], dtype=jnp.int32),
            layer=state.comp["SpriteComponent"]["layer"].astype(jnp.int32),
            sort_y=state.comp["SpriteComponent"]["sort_y"],
            flip_x=state.comp["SpriteComponent"]["flip_x"],
            valid=state.mask["SpriteComponent"] & state.alive,
            view_proj=cam.view_projection,
            materials=_per_entity_mats(state, bindings),
            atlas=bindings.atlas,
            width=W,
            height=H,
            use_pallas=True,
        )
    finally:
        rp.blend_tiles_pallas = orig
    return ref, pal


def _per_entity_mats(state, bindings):
    mats = bindings.materials
    idx = bindings.entity_material_idx
    return dataclasses.replace(
        mats, **{f.name: getattr(mats, f.name)[idx] for f in dataclasses.fields(mats)}
    )


def test_solid_sprite_matches_reference():
    s = sprite_scene([(0.0, 0.0, 0.0)])
    state = s.to_device_state()
    bindings = default_bindings(s.spec.padded_entities())
    (ref_color, ref_vis), (pal_color, pal_vis) = render_both(state, bindings)
    np.testing.assert_allclose(np.asarray(ref_color), np.asarray(pal_color), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ref_vis), np.asarray(pal_vis))


def test_layered_blend_matches_reference():
    s = sprite_scene([(0.0, 0.0, 0.0), (0.15, 0.0, 0.0)], layers=[0, 1])
    state = s.to_device_state()
    bindings = default_bindings(s.spec.padded_entities())
    mats = bindings.materials
    mats = dataclasses.replace(
        mats, albedo_color=mats.albedo_color.at[1].set(jnp.array([0.2, 0.9, 0.3, 0.5]))
    )
    bindings = dataclasses.replace(
        bindings, materials=mats, entity_material_idx=bindings.entity_material_idx.at[1].set(1)
    )
    (ref_color, _), (pal_color, _) = render_both(state, bindings)
    np.testing.assert_allclose(np.asarray(ref_color), np.asarray(pal_color), atol=2e-2)


def test_textured_sprite_pallas():
    atlas = TextureAtlas(size=64)
    atlas.add("tex-red", Texture.solid("red", (255, 0, 0, 255), size=8))
    pixels, rects = atlas.build()
    mats = pack_materials([Material(albedo_texture="tex-red")], {"tex-red": rects["tex-red"]}, 64)
    s = sprite_scene([(0.0, 0.0, 0.0)])
    state = s.to_device_state()
    bindings = SpriteBatchBindings(
        materials=mats,
        atlas=jnp.asarray(pixels),
        entity_material_idx=jnp.zeros((s.spec.padded_entities(),), jnp.int32),
    )
    (_, _), (pal_color, _) = render_both(state, bindings)
    c = np.asarray(pal_color)[H // 2, W // 2]
    np.testing.assert_allclose(c, [1.0, 0.0, 0.0, 1.0], atol=3e-2)
