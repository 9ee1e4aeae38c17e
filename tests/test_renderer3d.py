import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.assets.material import empty_gpu_materials
from oxylus_tpu.core.config import RendererConfig
from oxylus_tpu.render.renderer3d import RenderSpec, RendererInstance, RenderStage
from oxylus_tpu.render.scene3d import upload_meshes
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render3d import cube_mesh, look_down_z_camera

W, H = 96, 64


@pytest.fixture(scope="module")
def world3d():
    spec = SceneSpec(max_entities=32)
    s = Scene("3d", spec=spec)
    cube = s.create_entity("cube")
    cube.add("TransformComponent", position=(0.0, 0.0, 0.0))
    cube.add("MeshComponent")
    sun = s.create_entity("sun")
    sun.add("TransformComponent", position=(0.0, 5.0, 0.0))
    sun.add("LightComponent", type="Directional", color=(1.0, 1.0, 1.0), intensity=3.0)
    state = s.to_device_state()

    pos, nrm, uv, idx = cube_mesh()
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, cube.index, 0)])
    cam = look_down_z_camera(aspect=W / H)
    return s, state, gscene, cam


def test_full_frame(world3d):
    s, state, gscene, cam = world3d
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    mats = empty_gpu_materials(16)
    atlas = jnp.zeros((16, 16, 4), jnp.uint8)
    cfg = RendererConfig()
    ctx = inst.render(state, gscene, cam, mats, atlas, cfg)
    img = np.asarray(ctx["final"])
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    # cube face is lit (brighter than background) at center
    c = img[H // 2, W // 2]
    corner = img[2, 2]
    assert c.mean() > corner.mean() + 0.05
    # gbuffer normal at center faces +z
    n = np.asarray(ctx["gbuffer"]["normal"])[H // 2, W // 2]
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-3)
    # depth non-zero at center
    assert float(np.asarray(ctx["depth"])[H // 2, W // 2]) > 0.0


def test_stage_callbacks(world3d):
    s, state, gscene, cam = world3d
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    calls = []

    def before_lighting(ctx):
        calls.append("before_lighting")
        assert "gbuffer" in ctx
        return ctx

    def after_post(ctx):
        calls.append("after_post")
        ctx["final"] = ctx["final"] * 0.0  # editor-style override
        return ctx

    inst.add_stage_callback(RenderStage.LIGHTING, "before", before_lighting)
    inst.add_stage_callback(RenderStage.POST_PROCESSING, "after", after_post)
    ctx = inst.render(
        state, gscene, cam, empty_gpu_materials(16), jnp.zeros((16, 16, 4), jnp.uint8), RendererConfig()
    )
    assert calls == ["before_lighting", "after_post"]
    assert float(np.asarray(ctx["final"]).max()) == 0.0


def test_uv_interpolation(world3d):
    s, state, gscene, cam = world3d
    inst = RendererInstance(RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False))
    ctx = inst.render(
        state, gscene, cam, empty_gpu_materials(16), jnp.zeros((16, 16, 4), jnp.uint8), RendererConfig()
    )
    uv = np.asarray(ctx["gbuffer"]["uv"])
    hit = np.asarray(ctx["gbuffer"]["hit"])
    vals = uv[hit]
    assert vals.min() >= -1e-3 and vals.max() <= 1 + 1e-3
    # uv varies across the face
    assert vals[:, 0].std() > 0.05
