"""Body sleeping / island deactivation (Jolt semantics, per-body + wake propagation).

Reference behavior: Jolt deactivates settled islands (mTimeBeforeSleep 0.5 s,
mPointVelocitySleepThreshold 0.03 m/s) and fires BodyActivationListener events,
which the reference routes to Lua (`Scene.cpp:1657-1715`). Here: per-body timers
with contact-graph wake propagation in `physics_substep`, the same thresholds in
`PhysicsParams`, and `ActivationTracker` → `on_body_activated/deactivated` hooks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oxylus_tpu.physics.events import ActivationTracker
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.step import physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from oxylus_tpu.scripting.system import Script, ScriptSystem

DT = 1.0 / 60.0


def _box_on_floor(n=1):
    s = Scene("sleep", spec=SceneSpec(max_entities=32, max_bodies=32))
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(20.0, 1.0, 20.0), friction=0.6)
    boxes = []
    for i in range(n):
        b = s.create_entity(f"box{i}")
        b.add("TransformComponent", position=(0.0, 0.4 + 1.0 * i, 0.0))
        b.add("BoxColliderComponent", size=(0.5, 0.5, 0.5), friction=0.6)
        b.add("RigidBodyComponent", type="Dynamic", mass=1.0)
        boxes.append(b)
    s.runtime_start()
    return s, floor, boxes


def test_settled_body_falls_asleep():
    s, floor, (box,) = _box_on_floor()
    params = PhysicsParams(max_pairs=64)
    ps = s.physics_state
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(120):  # 2 s: settle (≈0.1 s fall) + sleep_time 0.5 s
        ps = step(ps)
    asleep = np.asarray(ps.asleep)
    assert asleep[1], "settled box should be asleep"
    assert not asleep[0], "static floor never sleeps"
    np.testing.assert_allclose(np.asarray(ps.linvel[1]), 0.0)


def test_sleeping_disabled_by_params():
    s, floor, (box,) = _box_on_floor()
    params = PhysicsParams(max_pairs=64, allow_sleeping=False)
    ps = s.physics_state
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(120):
        ps = step(ps)
    assert not np.asarray(ps.asleep).any()


def test_impact_wakes_sleeping_body():
    s, floor, (box,) = _box_on_floor()
    params = PhysicsParams(max_pairs=64)
    ps = s.physics_state
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(120):
        ps = step(ps)
    assert np.asarray(ps.asleep)[1]

    # drop a second box onto the sleeping one: activate a spare slot directly
    host = {f.name: np.array(getattr(ps, f.name)) for f in dataclasses.fields(ps)
            if f.name not in ("accumulator", "has_proxies")
            and not f.name.startswith("mesh_")}
    slot = 2
    host["active"][slot] = True
    host["entity"][slot] = -1
    host["body_type"][slot] = 2  # dynamic
    host["shape_type"][slot] = 0
    host["pos"][slot] = [0.05, 2.5, 0.0]
    host["quat"][slot] = [0, 0, 0, 1]
    host["half_extent"][slot] = [0.5, 0.5, 0.5]
    host["inv_mass"][slot] = 1.0
    host["inv_inertia"][slot] = [6.0, 6.0, 6.0]
    host["friction"][slot] = 0.5
    host["gravity_factor"][slot] = 1.0
    host["dof_mask_lin"][slot] = [1, 1, 1]
    host["dof_mask_ang"][slot] = [1, 1, 1]
    ps = dataclasses.replace(
        ps, **{k: jnp.asarray(v) for k, v in host.items()}
    )
    woke = False
    for _ in range(90):
        ps = step(ps)
        if not bool(np.asarray(ps.asleep)[1]):
            woke = True
            break
    assert woke, "impact should wake the sleeping box"
    # and eventually both settle and sleep again
    for _ in range(240):
        ps = step(ps)
    assert np.asarray(ps.asleep)[1] and np.asarray(ps.asleep)[2]


def test_activation_script_hooks_fire():
    s, floor, (box,) = _box_on_floor()
    script = Script.compile(
        "sleepwatch",
        """
events = []
def on_body_activated(scene, entity):
    events.append(("activated", entity))
def on_body_deactivated(scene, entity):
    events.append(("deactivated", entity))
""",
    )
    sysm = ScriptSystem(script, s)
    s.lua_systems["w"] = sysm
    params = PhysicsParams(max_pairs=64)
    ps = s.physics_state
    tracker = ActivationTracker()
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    tracker.dispatch(s, ps)  # baseline snapshot (all awake)
    for _ in range(120):
        ps = step(ps)
        tracker.dispatch(s, ps)
    events = script.namespace["events"]
    assert ("deactivated", box.index) in events
    # kick it: wake by giving it velocity (script-style external write)
    ps = dataclasses.replace(
        ps,
        linvel=ps.linvel.at[1, 0].set(2.0),
        asleep=ps.asleep.at[1].set(False),
    )
    tracker.dispatch(s, ps)
    assert ("activated", box.index) in events
