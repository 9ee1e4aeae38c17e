import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.scene.frame import frame_step
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def sim_scene():
    spec = SceneSpec(max_entities=64, max_bodies=64, max_particles=512)
    s = Scene("frame", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(50.0, 1.0, 50.0))
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 4.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent", type="Dynamic")
    return s


def test_frame_step_advances_physics_into_transforms():
    s = sim_scene()
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    y0 = float(state.comp["TransformComponent"]["position"][1, 1])
    for _ in range(30):
        state, ps = frame_step(state, ps, params, DT, s.spec)
    y1 = float(state.comp["TransformComponent"]["position"][1, 1])
    assert y1 < y0 - 0.1  # box fell
    # world matrix mirrors the transform
    assert float(state.world[1, 1, 3]) == pytest.approx(y1, abs=1e-4)
    assert int(state.frame) == 30
    assert float(state.time) == pytest.approx(0.5, abs=1e-5)


def test_frame_step_settles_on_floor():
    s = sim_scene()
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(360):
        state, ps = frame_step(state, ps, params, DT, s.spec)
    y = float(state.comp["TransformComponent"]["position"][1, 1])
    assert y == pytest.approx(0.5, abs=0.06)


def test_rigidbody_component_sync():
    s = sim_scene()
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    state, ps = frame_step(state, ps, params, DT, s.spec)
    rb_t = np.asarray(state.comp["RigidBodyComponent"]["translation"][1])
    np.testing.assert_allclose(rb_t, np.asarray(ps.pos[1]), atol=1e-6)


def test_sprite_animation_clock():
    spec = SceneSpec(max_entities=16)
    s = Scene("anim", spec=spec)
    e = s.create_entity("sprite")
    e.add("TransformComponent")
    e.add("SpriteComponent")
    e.add("SpriteAnimationComponent", num_frames=4, fps=8, loop=True)
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(45):  # 0.75 s; duration = 4/8 = 0.5 s → wraps to 0.25
        state, ps = frame_step(state, ps, params, DT, s.spec)
    t = float(state.comp["SpriteAnimationComponent"]["current_time"][e.index])
    assert t == pytest.approx(0.25, abs=1e-3)


def test_particles_spawn_and_die():
    spec = SceneSpec(max_entities=16, max_particles=256)
    s = Scene("parts", spec=spec)
    e = s.create_entity("emitter")
    e.add("TransformComponent", position=(0.0, 5.0, 0.0))
    e.add(
        "ParticleSystemComponent",
        rate_over_time=100,
        start_lifetime=0.5,
        looping=True,
        duration=10.0,
        start_velocity=(0.0, 1.0, 0.0),
    )
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(60):  # 1 s
        state, ps = frame_step(state, ps, params, DT, s.spec)
    n_alive = int(jnp.sum(state.particles.alive))
    # 100/s spawn, 0.5s life → steady state ≈ 50 alive
    assert 30 <= n_alive <= 70
    # particles should have positive y motion from start_velocity
    live_idx = np.nonzero(np.asarray(state.particles.alive))[0]
    ages = np.asarray(state.particles.age)[live_idx]
    assert ages.max() <= 0.5 + 1e-3


def test_hierarchy_follows_physics_parent():
    spec = SceneSpec(max_entities=16, max_bodies=16)
    s = Scene("h", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(50.0, 1.0, 50.0))
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 6.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent")
    child = s.create_entity("lamp").child_of(box)
    child.add("TransformComponent", position=(0.0, 1.0, 0.0))
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(30):
        state, ps = frame_step(state, ps, params, DT, s.spec)
    box_y = float(state.world[box.index, 1, 3])
    child_y = float(state.world[child.index, 1, 3])
    assert child_y == pytest.approx(box_y + 1.0, abs=1e-4)
