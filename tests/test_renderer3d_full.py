"""Full-featured frame: atmosphere + shadows + GTAO + two-pass occlusion."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.assets.material import empty_gpu_materials
from oxylus_tpu.core.config import RendererConfig
from oxylus_tpu.render.renderer3d import RenderSpec, RendererInstance
from oxylus_tpu.render.scene3d import upload_meshes
from oxylus_tpu.render.sky import AtmosphereParams
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render3d import cube_mesh, look_down_z_camera

W, H = 96, 64


def plane_mesh(size=20.0):
    s = size / 2
    pos = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32)
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint32)  # front face toward +Y
    return pos, nrm, uv, idx


@pytest.fixture(scope="module")
def world():
    spec = SceneSpec(max_entities=32)
    s = Scene("full3d", spec=spec)
    ground = s.create_entity("ground")
    ground.add("TransformComponent", position=(0.0, -1.0, 0.0))
    cube = s.create_entity("cube")
    cube.add("TransformComponent", position=(0.0, 0.0, 0.0))
    sun = s.create_entity("sun")
    # sun pitched down: rotate -Z forward → point downward-ish
    sun.add("TransformComponent", position=(0.0, 10.0, 0.0), rotation=(-0.3826834, 0.0, 0.0, 0.9238795))
    sun.add("LightComponent", type="Directional", color=(1.0, 0.98, 0.9), intensity=4.0)
    state = s.to_device_state()

    cp, cn, cu, ci = cube_mesh()
    baked_cube = bake_mesh(cp, cn, cu, ci)
    gp, gn, gu, gi = plane_mesh()
    baked_plane = bake_mesh(gp, gn, gu, gi)
    gscene = upload_meshes(
        [baked_cube, baked_plane], [(0, cube.index, 0), (1, ground.index, 0)], max_instances=4
    )
    cam = look_down_z_camera(aspect=W / H, pos=(0.0, 1.0, 4.0))
    return s, state, gscene, cam


def test_full_featured_frame(world):
    s, state, gscene, cam = world
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    cfg = RendererConfig()
    ctx = inst.render(
        state, gscene, cam, empty_gpu_materials(8), jnp.zeros((8, 8, 4), jnp.uint8), cfg,
        atmosphere=AtmosphereParams(),
        enable_shadows=True,
    )
    img = np.asarray(ctx["final"])
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    # sky pixels (top of frame) are nonzero (atmosphere background)
    assert img[2, :, :].mean() > 0.01
    # ground under the cube is in shadow: compare two ground points
    shadow = np.asarray(ctx["shadow"])
    assert shadow.shape == (H, W)
    assert shadow.min() < 0.6  # something is shadowed
    assert "ao" in ctx
    ao = np.asarray(ctx["ao"])
    assert (ao >= 0).all() and (ao <= 1).all()
    # carry contains HiZ for next-frame occlusion
    assert "hiz" in ctx["carry"]


def test_two_pass_occlusion_stable(world):
    s, state, gscene, cam = world
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    cfg = RendererConfig()
    mats = empty_gpu_materials(8)
    atlas = jnp.zeros((8, 8, 4), jnp.uint8)
    ctx1 = inst.render(state, gscene, cam, mats, atlas, cfg)
    ctx2 = inst.render(state, gscene, cam, mats, atlas, cfg, prev=ctx1["carry"])
    # static scene: second frame (with occlusion vs prev HiZ) renders the same visbuffer
    np.testing.assert_array_equal(np.asarray(ctx1["visbuffer"]), np.asarray(ctx2["visbuffer"]))
    np.testing.assert_allclose(np.asarray(ctx1["depth"]), np.asarray(ctx2["depth"]), atol=1e-6)


def test_exposure_carry(world):
    s, state, gscene, cam = world
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    cfg = RendererConfig()
    mats = empty_gpu_materials(8)
    atlas = jnp.zeros((8, 8, 4), jnp.uint8)
    prev = {"adapt_luminance": jnp.float32(0.5)}
    ctx = inst.render(state, gscene, cam, mats, atlas, cfg, prev=prev)
    assert "adapt_luminance" in ctx["carry"]
    assert np.isfinite(float(ctx["carry"]["adapt_luminance"]))


def test_debug_views(world):
    s, state, gscene, cam = world
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    mats = empty_gpu_materials(8)
    atlas = jnp.zeros((8, 8, 4), jnp.uint8)
    for mode in (1, 2, 5, 7, 8):
        cfg = RendererConfig(debug_view=mode)
        ctx = inst.render(state, gscene, cam, mats, atlas, cfg)
        img = np.asarray(ctx["final"])
        assert np.isfinite(img).all()
        # hit pixels are colored, background dark
        hit = np.asarray(ctx["gbuffer"]["hit"])
        assert img[hit].mean() > 0.05
