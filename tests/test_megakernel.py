"""Mega-kernel physics tests (interpret mode — exercises the exact kernel code)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.physics.megakernel import megakernel_substeps
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def make_scene():
    spec = SceneSpec(max_entities=256, max_bodies=128)
    s = Scene("mega", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(50.0, 1.0, 50.0), friction=0.8)
    return s


def run(ps, params, n, **kw):
    step = jax.jit(
        lambda p: megakernel_substeps(p, params, DT, n_substeps=1, interpret=True, **kw)
    )
    for _ in range(n):
        ps = step(ps)
    return ps


def test_free_fall():
    spec = SceneSpec(max_entities=256, max_bodies=128)
    s = Scene("ff", spec=spec)
    b = s.create_entity("ball")
    b.add("TransformComponent", position=(0.0, 100.0, 0.0))
    b.add("SphereColliderComponent", radius=0.5)
    b.add("RigidBodyComponent", linear_drag=0.0)
    s.runtime_start()
    ps = run(s.physics_state, PhysicsParams(), 60)
    expected = 100.0 - 9.81 * DT * DT * (60 * 61) / 2
    assert float(ps.pos[0, 1]) == pytest.approx(expected, abs=1e-2)


def test_sphere_and_box_rest():
    s = make_scene()
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(3.0, 2.0, 0.0))
    ball.add("SphereColliderComponent", radius=0.5)
    ball.add("RigidBodyComponent")
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 2.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent")
    s.runtime_start()
    ps = run(s.physics_state, PhysicsParams(), 240)
    assert float(ps.pos[1, 1]) == pytest.approx(0.5, abs=0.06)
    assert float(ps.pos[2, 1]) == pytest.approx(0.5, abs=0.06)
    assert float(jnp.linalg.norm(ps.linvel[1:3])) < 0.1


def test_stack_stays_up():
    s = make_scene()
    for i in range(3):
        b = s.create_entity(f"b{i}")
        b.add("TransformComponent", position=(0.0, 0.5 + 1.02 * i, 0.0))
        b.add("BoxColliderComponent", size=(0.5, 0.5, 0.5), friction=0.8)
        b.add("RigidBodyComponent")
    s.runtime_start()
    ps = run(s.physics_state, PhysicsParams(), 240)
    ys = sorted(float(ps.pos[i, 1]) for i in range(1, 4))
    assert ys[0] == pytest.approx(0.5, abs=0.1)
    assert ys[1] == pytest.approx(1.5, abs=0.15)
    assert ys[2] == pytest.approx(2.5, abs=0.2)
    assert float(jnp.abs(ps.pos[1:4, [0, 2]]).max()) < 0.1


def test_friction_stops_slider():
    s = make_scene()
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 0.5, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5), friction=0.6)
    box.add("RigidBodyComponent", linear_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    ps = dataclasses.replace(ps, linvel=ps.linvel.at[1].set(jnp.array([4.0, 0.0, 0.0])))
    ps = run(ps, PhysicsParams(), 240)
    assert float(jnp.linalg.norm(ps.linvel[1])) < 0.15
    assert float(ps.pos[1, 0]) > 0.5


def test_multi_substep_launch_equivalent():
    s = make_scene()
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 3.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent")
    s.runtime_start()
    params = PhysicsParams()
    ps1 = run(s.physics_state, params, 30)
    ps2 = megakernel_substeps(s.physics_state, params, DT, n_substeps=30, interpret=True)
    np.testing.assert_allclose(np.asarray(ps1.pos[1]), np.asarray(ps2.pos[1]), atol=1e-4)
