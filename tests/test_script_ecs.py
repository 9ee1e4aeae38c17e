"""Script-defined ECS systems, observers, and per-frame script dispatch.

Reference: Lua scripts can define flecs systems/observers/queries
(`/root/reference/Oxylus/src/Scripting/LuaFlecsBindings.cpp`) and receive
per-frame lifecycle callbacks from `Scene::runtime_update`
(`/root/reference/Oxylus/src/Scene/Scene.cpp:1139-1157`,
`LuaSystem.hpp:25-100`).
"""

import numpy as np

from oxylus_tpu.runtime import SceneRunner
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from oxylus_tpu.scripting.system import Script, ScriptSystem


def _make_scene(n=4):
    s = Scene("ecs", spec=SceneSpec(max_entities=64, max_bodies=16, max_particles=16))
    for i in range(n):
        e = s.create_entity(f"e{i}")
        e.add("TransformComponent", position=(float(i), 0.0, 0.0))
        if i % 2 == 0:
            e.add("SpriteComponent")
    return s


class TestSceneSystems:
    def test_register_and_progress_per_entity(self):
        s = _make_scene()
        seen = []
        h = s.register_system(
            lambda e, dt: seen.append(e.name), comps=("SpriteComponent",)
        )
        s.progress(1 / 60)
        assert sorted(seen) == ["e0", "e2"]
        s.unregister_system(h)
        seen.clear()
        s.progress(1 / 60)
        assert seen == []

    def test_phase_order(self):
        s = _make_scene()
        order = []
        s.register_system(lambda sc, dt: order.append("post"), phase="post_update")
        s.register_system(lambda sc, dt: order.append("pre"), phase="pre_update")
        s.register_system(lambda sc, dt: order.append("mid"), phase="update")
        s.progress(1 / 60)
        assert order == ["pre", "mid", "post"]

    def test_system_errors_do_not_propagate(self):
        s = _make_scene()

        def boom(sc, dt):
            raise RuntimeError("boom")

        s.register_system(boom)
        s.progress(1 / 60)  # must not raise

    def test_bad_phase_rejected(self):
        s = _make_scene()
        try:
            s.register_system(lambda sc, dt: None, phase="nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestObservers:
    def test_component_add_remove(self):
        s = _make_scene()
        events = []
        s.observe("CameraComponent", "add", lambda e: events.append(("add", e.name)))
        s.observe("CameraComponent", "remove", lambda e: events.append(("rm", e.name)))
        e = s.entity("e1")
        e.add("CameraComponent")
        e.add("CameraComponent")  # re-add: no second fire
        e.remove("CameraComponent")
        e.remove("CameraComponent")  # re-remove: no second fire
        assert events == [("add", "e1"), ("rm", "e1")]

    def test_tag_observers(self):
        s = _make_scene()
        events = []
        s.observe("Hidden", "add", lambda e: events.append(e.name))
        s.entity("e0").add_tag("Hidden")
        assert events == ["e0"]

    def test_unobserve(self):
        s = _make_scene()
        events = []
        h = s.observe("CameraComponent", "add", lambda e: events.append(e.name))
        s.unobserve(h)
        s.entity("e0").add("CameraComponent")
        assert events == []

    def test_observer_error_swallowed(self):
        s = _make_scene()
        s.observe("CameraComponent", "add", lambda e: 1 / 0)
        s.entity("e0").add("CameraComponent")  # must not raise


SCRIPT_SRC = """
def on_scene_start(scene, env):
    env["updates"] = 0
    env["fixed"] = 0
    env["renders"] = 0
    env["spawned"] = []
    scene.observe("SpriteComponent", "add", lambda e: env["spawned"].append(e.name))

    def drift(e, dt):
        p = e.get("TransformComponent")["position"]
        e.set("TransformComponent", position=(p[0] + dt, p[1], p[2]))

    scene.register_system(drift, comps=("TransformComponent", "SpriteComponent"))

def on_scene_update(scene, dt, env):
    env["updates"] += 1
    if env["updates"] == 2:
        e = scene.create_entity("spawned_sprite")
        e.add("TransformComponent")
        e.add("SpriteComponent")

def on_fixed_update(scene, dt, env):
    env["fixed"] += 1

def on_scene_render(scene, extent, env):
    env["renders"] += 1
"""


class TestRunnerScriptDispatch:
    def test_lifecycle_and_world_merge(self):
        s = _make_scene()
        script = Script.compile("game", SCRIPT_SRC)
        s.lua_systems["game"] = ScriptSystem(script, s)
        runner = SceneRunner(s, render_mode="none")
        env = s.lua_systems["game"].env
        runner.run(4, dt=1.0 / 60.0, render=False)

        assert env["updates"] == 4
        # 60 Hz fixed tick at dt=1/60 → one fixed update per frame
        assert env["fixed"] == 4
        assert env["renders"] == 0  # render_mode none
        # observer fired for the script-spawned sprite
        assert env["spawned"] == ["spawned_sprite"]
        # the script-registered drift system moved sprite entities, and the host
        # edit was merged into the device state (one world)
        host = runner.sync_to_host()
        p0 = host.entity("e0").get("TransformComponent")["position"]
        assert p0[0] > 0.0
        # spawned entity exists in the merged device state
        assert bool(np.asarray(runner.state.alive).sum() >= 5)

    def test_fixed_update_cadence(self):
        s = _make_scene()
        script = Script.compile("t", "def on_fixed_update(scene, dt, env):\n    env['n'] = env.get('n', 0) + 1\n")
        s.lua_systems["t"] = ScriptSystem(script, s)
        runner = SceneRunner(s, render_mode="none")
        runner.run(2, dt=1.0 / 30.0, render=False)  # two 60 Hz ticks per frame
        assert s.lua_systems["t"].env["n"] == 4
