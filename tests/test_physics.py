import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.physics.build import build_physics_state
from oxylus_tpu.physics.state import BODY_DYNAMIC, PhysicsParams
from oxylus_tpu.physics.step import broadphase_pairs, physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def small_spec(**kw):
    kw.setdefault("max_entities", 64)
    kw.setdefault("max_bodies", 64)
    kw.setdefault("max_contacts", 256)
    return SceneSpec(**kw)


def small_params(**kw):
    kw.setdefault("max_pairs", 128)
    return PhysicsParams(**kw)


def floor_scene(spec=None):
    s = Scene("phys", spec=spec or small_spec())
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(100.0, 1.0, 100.0), friction=0.5)
    return s


def run_steps(ps, params, n, dt=DT):
    step = jax.jit(lambda p: physics_substep(p, params, dt))
    for _ in range(n):
        ps = step(ps)
    return ps


def test_free_fall_matches_analytic():
    s = Scene("fall", spec=small_spec())
    e = s.create_entity("ball")
    e.add("TransformComponent", position=(0.0, 100.0, 0.0))
    e.add("SphereColliderComponent", radius=0.5)
    e.add("RigidBodyComponent", type="Dynamic", mass=1.0, linear_drag=0.0)
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 60)  # 1 second
    y = float(ps.pos[0, 1])
    # semi-implicit Euler: y = y0 - g*dt^2*sum(k) = y0 - g*dt^2*n(n+1)/2
    expected = 100.0 - 9.81 * DT * DT * (60 * 61) / 2
    assert y == pytest.approx(expected, abs=1e-3)


def test_sphere_rests_on_floor():
    s = floor_scene()
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(0.0, 3.0, 0.0))
    ball.add("SphereColliderComponent", radius=0.5)
    ball.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 300)  # 5 seconds
    # floor top at y=0, sphere radius 0.5 → rest center y ≈ 0.5 (slop tolerance)
    y = float(ps.pos[1, 1])
    assert y == pytest.approx(0.5, abs=0.05)
    v = float(jnp.linalg.norm(ps.linvel[1]))
    assert v < 0.05


def test_box_rests_on_floor():
    s = floor_scene()
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 2.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 300)
    y = float(ps.pos[1, 1])
    assert y == pytest.approx(0.5, abs=0.05)
    # orientation should stay upright
    q = np.asarray(ps.quat[1])
    assert abs(abs(q[3]) - 1.0) < 0.02


def test_restitution_bounce():
    s = floor_scene()
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(0.0, 2.0, 0.0))
    ball.add("SphereColliderComponent", radius=0.5, restitution=0.8)
    ball.add("RigidBodyComponent", type="Dynamic", mass=1.0, linear_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    params = small_params()
    heights = []
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(240):
        ps = step(ps)
        heights.append(float(ps.pos[1, 1]))
    peak_after_bounce = max(heights[60:])
    # dropped from 2.0 (1.5m above rest) with e=0.8 → rebound ≈ 0.64 × 1.5 ≈ 0.96 above rest
    assert 0.7 < peak_after_bounce < 1.8
    assert min(heights) > 0.3  # never tunnels through the floor


def test_stack_remains_stable():
    s = floor_scene()
    for i in range(3):
        b = s.create_entity(f"box{i}")
        b.add("TransformComponent", position=(0.0, 0.5 + 1.02 * i, 0.0))
        b.add("BoxColliderComponent", size=(0.5, 0.5, 0.5), friction=0.8)
        b.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 240)
    ys = sorted(float(ps.pos[i, 1]) for i in range(1, 4))
    assert ys[0] == pytest.approx(0.5, abs=0.1)
    assert ys[1] == pytest.approx(1.5, abs=0.2)
    assert ys[2] == pytest.approx(2.5, abs=0.3)
    # lateral drift stays small
    for i in range(1, 4):
        assert abs(float(ps.pos[i, 0])) < 0.3
        assert abs(float(ps.pos[i, 2])) < 0.3


def test_static_bodies_do_not_move():
    s = floor_scene()
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 60)
    np.testing.assert_allclose(np.asarray(ps.pos[0]), [0.0, -1.0, 0.0], atol=1e-6)


def test_friction_stops_sliding_box():
    s = floor_scene()
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 0.5, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5), friction=0.6)
    box.add("RigidBodyComponent", type="Dynamic", mass=1.0, linear_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    ps = dataclasses.replace(ps, linvel=ps.linvel.at[1].set(jnp.array([4.0, 0.0, 0.0])))
    ps = run_steps(ps, small_params(), 300)
    v = float(jnp.linalg.norm(ps.linvel[1]))
    assert v < 0.1  # friction brought it to rest
    assert float(ps.pos[1, 0]) > 0.5  # but it did slide some distance


def test_broadphase_finds_overlaps():
    s = floor_scene()
    a = s.create_entity("a")
    a.add("TransformComponent", position=(0.0, 0.4, 0.0))
    a.add("SphereColliderComponent", radius=0.5)
    a.add("RigidBodyComponent")
    b = s.create_entity("b")
    b.add("TransformComponent", position=(0.0, 1.0, 0.0))
    b.add("SphereColliderComponent", radius=0.5)
    b.add("RigidBodyComponent")
    far = s.create_entity("far")
    far.add("TransformComponent", position=(50.0, 50.0, 0.0))
    far.add("SphereColliderComponent", radius=0.5)
    far.add("RigidBodyComponent")
    s.runtime_start()
    params = small_params()
    ia, ib, valid = broadphase_pairs(s.physics_state, params, DT)
    n = int(jnp.sum(valid))
    pairs = {(int(ia[i]), int(ib[i])) for i in range(n)}
    assert (0, 1) in pairs  # floor-a
    assert (1, 2) in pairs  # a-b
    assert not any(3 in p for p in pairs)  # far body has no pairs
    assert n == 2


def test_dof_lock_plane2d():
    s = floor_scene()
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.3, 3.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    # Plane2D: TranslationX | TranslationY | RotationZ = 0b100011
    box.add("RigidBodyComponent", type="Dynamic", allowed_dofs=0b100011)
    s.runtime_start()
    ps = run_steps(s.physics_state, small_params(), 120)
    assert float(jnp.abs(ps.pos[1, 2])) < 1e-5  # no z translation
    q = np.asarray(ps.quat[1])
    assert abs(q[0]) < 1e-5 and abs(q[1]) < 1e-5  # no x/y rotation


def test_kinematic_body_moves_by_velocity():
    s = Scene("kin", spec=small_spec())
    k = s.create_entity("plat")
    k.add("TransformComponent", position=(0.0, 0.0, 0.0))
    k.add("BoxColliderComponent", size=(1.0, 0.1, 1.0))
    k.add("RigidBodyComponent", type="Kinematic")
    s.runtime_start()
    ps = s.physics_state
    ps = dataclasses.replace(ps, linvel=ps.linvel.at[0].set(jnp.array([1.0, 0.0, 0.0])))
    ps = run_steps(ps, small_params(), 60)
    assert float(ps.pos[0, 0]) == pytest.approx(1.0, abs=1e-3)
