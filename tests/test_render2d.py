import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.material import (
    FLAG_HAS_ALBEDO,
    Material,
    pack_materials,
)
from oxylus_tpu.assets.texture import Texture, TextureAtlas
from oxylus_tpu.ops.sampling import f32_to_sortable_u32, sample_atlas_bilinear
from oxylus_tpu.render.camera import camera_from_state, camera_matrices
from oxylus_tpu.render.renderer2d import SpriteBatchBindings, default_bindings, render_2d
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

W, H = 128, 96


def test_sortable_float_bits():
    vals = jnp.array([-100.0, -1.0, -0.0, 0.0, 0.5, 2.0, 1e9])
    keys = np.asarray(f32_to_sortable_u32(vals))
    assert list(keys) == sorted(keys)


def test_atlas_pack_and_sample():
    atlas = TextureAtlas(size=64)
    red = Texture.solid("red", (255, 0, 0, 255), size=8)
    blue = Texture.solid("blue", (0, 0, 255, 255), size=8)
    atlas.add("red", red)
    atlas.add("blue", blue)
    pixels, rects = atlas.build()
    a = jnp.asarray(pixels)
    c = sample_atlas_bilinear(a, jnp.asarray(rects["red"]), jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(c), [1.0, 0.0, 0.0, 1.0], atol=1e-2)
    c2 = sample_atlas_bilinear(a, jnp.asarray(rects["blue"]), jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(c2), [0.0, 0.0, 1.0, 1.0], atol=1e-2)


def _ortho_cam():
    # 2D camera at origin looking down -z, ortho zoom 1 → world [-aspect..aspect]×[-1..1]
    return camera_matrices(
        position=jnp.array([0.0, 0.0, 10.0]),
        yaw=jnp.float32(-np.pi / 2),
        pitch=jnp.float32(0.0),
        tilt=jnp.float32(0.0),
        fov_deg=jnp.float32(60.0),
        near=jnp.float32(0.01),
        far=jnp.float32(100.0),
        zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(1),
        aspect=jnp.float32(W / H),
    )


def sprite_scene(positions, scales=None, colors=None, layers=None):
    spec = SceneSpec(max_entities=32)
    s = Scene("2d", spec=spec)
    n = len(positions)
    scales = scales or [(1.0, 1.0, 1.0)] * n
    layers = layers or [0] * n
    for i, (p, sc, ly) in enumerate(zip(positions, scales, layers)):
        e = s.create_entity(f"sprite{i}")
        e.add("TransformComponent", position=p, scale=sc)
        e.add("SpriteComponent", layer=ly, sort_y=True)
    return s


def test_render_solid_sprite_center():
    s = sprite_scene([(0.0, 0.0, 0.0)], scales=[(1.0, 1.0, 1.0)])
    state = s.to_device_state()
    bindings = default_bindings(s.spec.padded_entities())
    cam = _ortho_cam()
    color, vis = render_2d(state, cam, bindings, width=W, height=H)
    color = np.asarray(color)
    vis = np.asarray(vis)
    cy, cx = H // 2, W // 2
    # default material = opaque white
    np.testing.assert_allclose(color[cy, cx], [1.0, 1.0, 1.0, 1.0], atol=1e-5)
    assert vis[cy, cx] == 0  # entity id of the sprite
    # corners empty
    assert color[2, 2, 3] == 0.0
    assert vis[2, 2] == -1


def test_render_textured_sprite():
    atlas = TextureAtlas(size=64)
    atlas.add("tex-red", Texture.solid("red", (255, 0, 0, 255), size=8))
    pixels, rects = atlas.build()
    mats = pack_materials(
        [Material(albedo_texture="tex-red")], {"tex-red": rects["tex-red"]}, capacity=64
    )
    s = sprite_scene([(0.0, 0.0, 0.0)])
    state = s.to_device_state()
    bindings = SpriteBatchBindings(
        materials=mats,
        atlas=jnp.asarray(pixels),
        entity_material_idx=jnp.zeros((s.spec.padded_entities(),), jnp.int32),
    )
    color, _ = render_2d(state, _ortho_cam(), bindings, width=W, height=H)
    c = np.asarray(color)[H // 2, W // 2]
    np.testing.assert_allclose(c, [1.0, 0.0, 0.0, 1.0], atol=2e-2)


def test_layer_ordering():
    # two overlapping sprites; higher layer draws later (on top)
    s = sprite_scene([(0.0, 0.0, 0.0), (0.1, 0.0, 0.0)], layers=[1, 0])
    # give them distinct materials via alpha? use albedo color per material slot
    state = s.to_device_state()
    bindings = default_bindings(s.spec.padded_entities())
    # entity 0 → slot 0 (white), entity 1 → slot 1 (green)
    mats = bindings.materials
    mats = dataclasses.replace(
        mats, albedo_color=mats.albedo_color.at[1].set(jnp.array([0.0, 1.0, 0.0, 1.0]))
    )
    bindings = dataclasses.replace(
        bindings,
        materials=mats,
        entity_material_idx=bindings.entity_material_idx.at[1].set(1),
    )
    color, vis = render_2d(state, _ortho_cam(), bindings, width=W, height=H)
    c = np.asarray(color)[H // 2, W // 2]
    # overlap region: layer 1 (white, entity 0) must be on top
    np.testing.assert_allclose(c, [1.0, 1.0, 1.0, 1.0], atol=1e-5)
    assert int(np.asarray(vis)[H // 2, W // 2]) == 0


def test_y_sort_ordering():
    # same layer, sort_y: lower y draws on top (later)
    s = sprite_scene([(0.0, 0.3, 0.0), (0.0, -0.3, 0.0)])
    state = s.to_device_state()
    bindings = default_bindings(s.spec.padded_entities())
    mats = bindings.materials
    mats = dataclasses.replace(
        mats, albedo_color=mats.albedo_color.at[1].set(jnp.array([1.0, 0.0, 0.0, 1.0]))
    )
    bindings = dataclasses.replace(
        bindings,
        materials=mats,
        entity_material_idx=bindings.entity_material_idx.at[1].set(1),
    )
    color, vis = render_2d(state, _ortho_cam(), bindings, width=W, height=H)
    # overlap at center: sprite 1 (y=-0.3, red) should be in front
    c = np.asarray(color)[H // 2, W // 2]
    np.testing.assert_allclose(c, [1.0, 0.0, 0.0, 1.0], atol=1e-5)


def test_sprite_animation_uv_window():
    spec = SceneSpec(max_entities=16)
    s = Scene("anim", spec=spec)
    e = s.create_entity("sp")
    e.add("TransformComponent")
    e.add("SpriteComponent")
    e.add("SpriteAnimationComponent", num_frames=4, fps=4, columns=2)
    s.set_field(e.index, "SpriteAnimationComponent", "current_time", 0.3)  # frame 1
    state = s.to_device_state()
    from oxylus_tpu.render.renderer2d import sprite_animation_uv

    size, off = sprite_animation_uv(state, jnp.arange(16))
    np.testing.assert_allclose(np.asarray(size[e.index]), [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(off[e.index]), [0.5, 0.0], atol=1e-6)  # frame 1 → col 1, row 0
