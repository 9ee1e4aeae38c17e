"""Tests for audio, input, scripting, debug renderer modules."""

import numpy as np
import pytest

from oxylus_tpu.audio.engine import (
    ATTENUATION_INVERSE,
    ATTENUATION_LINEAR,
    AudioClip,
    AudioEngine,
    sync_sources_from_scene,
)
from oxylus_tpu.core.input import CursorState, Input, KeyCode, MouseButton
from oxylus_tpu.render.debugdraw import DebugRenderer
from oxylus_tpu.scripting.system import Script, ScriptManager, ScriptSystem


class TestAudio:
    def test_tone_mixing(self):
        eng = AudioEngine()
        src = eng.create_source(AudioClip.tone(440.0, 0.5))
        src.play()
        block = eng.render_block(4800)
        assert block.shape == (4800, 2)
        assert np.abs(block).max() > 0.1
        # non-looping source ends
        eng.render_block(48000)
        assert not src.playing
        assert np.abs(eng.render_block(100)).max() == 0.0

    def test_looping_wraps(self):
        eng = AudioEngine()
        src = eng.create_source(AudioClip.tone(440.0, 0.01), looping=True)
        src.play()
        eng.render_block(48000)
        assert src.playing

    def test_pitch_shifts_cursor(self):
        eng = AudioEngine()
        src = eng.create_source(AudioClip.tone(440.0, 1.0), pitch=2.0)
        src.play()
        eng.render_block(1000)
        assert src.cursor == pytest.approx(2000.0)

    def test_inverse_attenuation_distance(self):
        eng = AudioEngine()
        clip = AudioClip.tone(440.0, 1.0)
        src = eng.create_source(clip, spatialization=True, attenuation_model=ATTENUATION_INVERSE)
        src.play()
        src.position = np.array([0.0, 0.0, -1.0], np.float32)
        near = np.abs(eng.render_block(512)).max()
        src.cursor = 0.0
        src.position = np.array([0.0, 0.0, -50.0], np.float32)
        far = np.abs(eng.render_block(512)).max()
        assert far < near * 0.2

    def test_pan_left_right(self):
        eng = AudioEngine()
        src = eng.create_source(AudioClip.tone(440.0, 1.0), spatialization=True)
        src.play()
        src.position = np.array([5.0, 0.0, 0.0], np.float32)  # to the right of default listener
        block = eng.render_block(512)
        assert np.abs(block[:, 1]).max() > np.abs(block[:, 0]).max() * 2

    def test_wav_roundtrip(self, tmp_path):
        import wave

        path = tmp_path / "beep.wav"
        tone = (np.sin(np.linspace(0, 2 * np.pi * 100, 4800)) * 32000).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(48000)
            w.writeframes(tone.tobytes())
        clip = AudioClip.load(path)
        assert clip.samples.shape == (4800, 2)
        assert np.abs(clip.samples).max() == pytest.approx(32000 / 32767, abs=1e-3)

    def test_scene_sync(self):
        from oxylus_tpu.scene.scene import Scene
        from oxylus_tpu.scene.state import SceneSpec

        s = Scene("a", spec=SceneSpec(max_entities=16))
        e = s.create_entity("radio")
        e.add("TransformComponent", position=(1.0, 2.0, 3.0))
        e.add("AudioSourceComponent", volume=0.5, looping=True)
        lst = s.create_entity("ears")
        lst.add("TransformComponent", position=(0.0, 0.0, 0.0))
        lst.add("AudioListenerComponent", active=True)

        eng = AudioEngine()
        src_map = {e.index: eng.create_source(AudioClip.tone())}
        sync_sources_from_scene(eng, s, src_map)
        src = src_map[e.index]
        assert src.volume == 0.5
        assert src.looping
        np.testing.assert_allclose(src.position, [1.0, 2.0, 3.0])
        assert eng.listener(0).active


class TestInput:
    def test_key_edges(self):
        inp = Input()
        inp.inject_key_down(KeyCode.W)
        assert inp.get_key_pressed(KeyCode.W)
        assert inp.get_key_held(KeyCode.W)
        inp.reset_pressed()
        assert not inp.get_key_pressed(KeyCode.W)
        assert inp.get_key_held(KeyCode.W)
        inp.inject_key_up(KeyCode.W)
        assert inp.get_key_released(KeyCode.W)
        assert not inp.get_key_held(KeyCode.W)
        inp.reset_pressed()
        assert not inp.get_key_released(KeyCode.W)

    def test_repeat_down_is_single_press(self):
        inp = Input()
        inp.inject_key_down(KeyCode.A)
        inp.reset_pressed()
        inp.inject_key_down(KeyCode.A)  # OS repeat
        assert not inp.get_key_pressed(KeyCode.A)

    def test_mouse(self):
        inp = Input()
        inp.inject_mouse_move(10.0, 20.0)
        inp.inject_mouse_down(MouseButton.LEFT)
        assert inp.get_mouse_pressed(MouseButton.LEFT)
        assert inp.get_mouse_position() == (10.0, 20.0)
        assert inp.get_mouse_delta() == (10.0, 20.0)
        inp.reset_pressed()
        assert inp.get_mouse_delta() == (0.0, 0.0)

    def test_cursor_state(self):
        inp = Input()
        inp.set_cursor_state(CursorState.DISABLED)
        assert inp.cursor_state == CursorState.DISABLED


class TestScripting:
    SOURCE = """
state = {"updates": 0}

def on_scene_start(scene, env):
    env["started"] = True

def on_scene_update(scene, dt, env):
    state["updates"] += 1
    env["last_dt"] = dt

def on_contact_added(scene, a, b, manifold):
    state.setdefault("contacts", []).append((a, b))
"""

    def test_lifecycle(self):
        script = Script.compile("test", self.SOURCE)
        sys = ScriptSystem(script)
        assert sys.has("on_scene_start")
        assert not sys.has("on_scene_stop")
        sys.on_scene_start(None)
        assert sys.env["started"]
        sys.on_scene_update(None, 0.016)
        sys.on_scene_update(None, 0.016)
        assert script.namespace["state"]["updates"] == 2
        sys.on_contact_added(None, 1, 2)
        assert script.namespace["state"]["contacts"] == [(1, 2)]

    def test_script_errors_are_contained(self):
        script = Script.compile("bad", "def on_scene_update(scene, dt, env):\n    raise RuntimeError('boom')")
        sys = ScriptSystem(script)
        sys.on_scene_update(None, 0.016)  # must not raise

    def test_manager(self):
        mgr = ScriptManager()
        mgr.init()
        mgr.load_script("uuid-1", self.SOURCE, name="spawner")
        sys = mgr.create_system("uuid-1")
        assert sys is not None
        assert mgr.create_system("nope") is None
        # scripts see the engine API bindings
        api_script = mgr.load_script("uuid-2", "seen = Scene.__name__")
        assert api_script.namespace["seen"] == "Scene"


class TestDebugRenderer:
    def test_capacity_cap(self):
        dr = DebugRenderer(capacity=10)
        for i in range(20):
            dr.draw_line((0, 0, 0), (1, 1, 1))
        assert dr._count == 10

    def test_aabb_is_12_lines(self):
        dr = DebugRenderer()
        dr.draw_aabb((0, 0, 0), (1, 1, 1))
        assert dr._count == 12

    def test_line_raster_overlays(self):
        import jax.numpy as jnp

        from oxylus_tpu.render.camera import camera_matrices

        dr = DebugRenderer()
        dr.draw_line((-1.0, 0.0, -5.0), (1.0, 0.0, -5.0), color=(0.0, 1.0, 0.0))
        cam = camera_matrices(
            position=jnp.zeros(3),
            yaw=jnp.float32(-np.pi / 2),
            pitch=jnp.float32(0.0),
            tilt=jnp.float32(0.0),
            fov_deg=jnp.float32(60.0),
            near=jnp.float32(0.1),
            far=jnp.float32(100.0),
            zoom=jnp.float32(1.0),
            projection_kind=jnp.int32(0),
            aspect=jnp.float32(1.0),
        )
        img = jnp.zeros((64, 64, 3), jnp.float32)
        out = np.asarray(dr.rasterize_over(img, cam.view_projection))
        assert out[:, :, 1].max() == 1.0  # green line drawn
        assert (out[:, :, 1] > 0).sum() >= 20  # spans many pixels
