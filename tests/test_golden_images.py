"""Golden-image regression harness (VERDICT round-1 item 7).

Renders small deterministic frames for each pass combination and asserts PSNR
against stored goldens (tests/data/golden_*.npy, stored as uint8 to keep the
repo small). A deliberate one-line lighting change must fail these.

Regenerate deliberately after an intended visual change:
    OX_REGEN_GOLDENS=1 python -m pytest tests/test_golden_images.py -q
(then eyeball the diff summary it prints and commit the new goldens).

The renderer is fully deterministic on the CPU test platform (conftest pins
JAX_PLATFORMS=cpu), so tolerances only need to absorb cross-version float
noise: PSNR ≥ 40 dB is far above any visible change; a real lighting or pass
regression lands well below 30 dB.
"""

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.assets.material import empty_gpu_materials
from oxylus_tpu.render.renderer3d import RendererInstance, RenderSpec
from oxylus_tpu.render.sky import AtmosphereParams
from oxylus_tpu.core.config import RendererConfig
from oxylus_tpu.render.scene3d import upload_meshes
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render3d import cube_mesh, look_down_z_camera
from tests.test_renderer3d_full import plane_mesh

W, H = 256, 144
DATA = Path(__file__).parent / "data"
REGEN = os.environ.get("OX_REGEN_GOLDENS") == "1"


def _world(fov_deg=60.0):
    s = Scene("golden3d", spec=SceneSpec(max_entities=32))
    ground = s.create_entity("ground")
    ground.add("TransformComponent", position=(0.0, -1.0, 0.0))
    cube = s.create_entity("cube")
    cube.add("TransformComponent", position=(0.0, 0.0, 0.0))
    sun = s.create_entity("sun")
    sun.add("TransformComponent", position=(0.0, 10.0, 0.0),
            rotation=(-0.3826834, 0.0, 0.0, 0.9238795))
    sun.add("LightComponent", type="Directional", color=(1.0, 0.98, 0.9), intensity=4.0)
    state = s.to_device_state()
    baked_cube = bake_mesh(*cube_mesh())
    baked_plane = bake_mesh(*plane_mesh())
    gscene = upload_meshes(
        [baked_cube, baked_plane], [(0, cube.index, 0), (1, ground.index, 0)],
        max_instances=4,
    )
    cam = look_down_z_camera(aspect=W / H, pos=(0.0, 1.0, 4.0), fov_deg=fov_deg)
    return state, gscene, cam


def _render(name, fov_deg=60.0, **kw):
    state, gscene, cam = _world(fov_deg)
    inst = RendererInstance(
        RenderSpec(width=W, height=H, max_visible_meshlets=64, use_pallas=False)
    )
    cfg_kw = kw.pop("config", {})
    import dataclasses

    cfg = dataclasses.replace(RendererConfig(), **cfg_kw)
    ctx = inst.render(
        state, gscene, cam, empty_gpu_materials(8),
        jnp.zeros((8, 8, 4), jnp.uint8), cfg, **kw,
    )
    img = np.asarray(ctx["final"])
    assert np.isfinite(img).all()
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def _check(name, img):
    path = DATA / f"golden_{name}.npy"
    if REGEN or not path.exists():
        prev = np.load(path) if path.exists() else None
        np.save(path, img)
        if prev is not None:
            print(f"[golden {name}] regenerated, PSNR vs old: {psnr(prev, img):.1f} dB")
        pytest.skip(f"golden {name} (re)generated")
    golden = np.load(path)
    p = psnr(golden, img)
    assert p >= 40.0, f"golden {name}: PSNR {p:.1f} dB < 40 (visual regression)"


def test_golden_visbuffer_flat():
    _check("flat", _render("flat"))


def test_golden_sky():
    _check("sky", _render("sky", atmosphere=AtmosphereParams()))


def test_golden_shadows():
    _check("shadows", _render("shadows", atmosphere=AtmosphereParams(),
                              enable_shadows=True))


def test_golden_full():
    _check("full", _render(
        "full", atmosphere=AtmosphereParams(), enable_shadows=True,
        config=dict(ssr_enable=True),
    ))


def test_golden_sky_fov65():
    """A non-60° camera must render sky and geometry consistently: the frame
    graph derives the LOD projection scale and the sky-ray fan from the
    camera's ACTUAL projection matrix (round-4 fix: both used a hardcoded 60°,
    so a fov-65 camera drew geometry at fov 65 but sky at fov 60)."""
    _check("sky65", _render("sky65", fov_deg=65.0, atmosphere=AtmosphereParams()))


def test_fov_changes_sky_rays():
    """fov-65 and fov-60 frames must actually differ (the sky fan widens) —
    guards against the proj-scale derivation silently collapsing to a const."""
    a = _render("_f60", atmosphere=AtmosphereParams())
    b = _render("_f65", fov_deg=65.0, atmosphere=AtmosphereParams())
    assert psnr(a, b) < 45.0, "fov change produced a (near-)identical frame"


def test_golden_detects_lighting_change():
    """Sanity check on harness sensitivity: a deliberate lighting change
    (shadows off) must move PSNR below the acceptance threshold vs the
    shadows golden."""
    path = DATA / "golden_shadows.npy"
    if not path.exists():
        pytest.skip("shadows golden not generated yet")
    img = _render("noshadow", atmosphere=AtmosphereParams(), enable_shadows=False)
    golden = np.load(path)
    assert psnr(golden, img) < 40.0, "harness failed to detect a lighting change"
