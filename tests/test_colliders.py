"""Cylinder and tapered-capsule colliders (Jolt CylinderShape /
TaperedCapsuleShape semantics, `Components.hpp:331-349`, body construction
`Scene.cpp:1717-1850`). Round-1 degraded both to capsules; these tests pin the
real shapes: a cylinder stands flat on its cap (a capsule would roll/sit on a
hemisphere), lies at exactly its radius on its side, and a tapered capsule
rests tilted (its hull touches ground with both end spheres of different
radii at different heights)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oxylus_tpu.physics.state import SHAPE_CYLINDER, PhysicsParams
from oxylus_tpu.physics.step import physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def _floor():
    s = Scene("cyl", spec=SceneSpec(max_entities=32, max_bodies=32))
    f = s.create_entity("floor")
    f.add("TransformComponent", position=(0.0, -1.0, 0.0))
    f.add("BoxColliderComponent", size=(20.0, 1.0, 20.0), friction=0.6)
    return s


def _settle(s, steps=240):
    s.runtime_start()
    ps = s.physics_state
    params = PhysicsParams(max_pairs=128)
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(steps):
        ps = step(ps)
    return ps


def test_cylinder_shape_code_assigned():
    s = _floor()
    c = s.create_entity("cyl")
    c.add("TransformComponent", position=(0.0, 2.0, 0.0))
    c.add("CylinderColliderComponent", radius=0.5, height=1.0)
    c.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.runtime_start()
    ps = s.physics_state
    assert int(ps.shape_type[1]) == SHAPE_CYLINDER


def test_cylinder_stands_on_flat_cap():
    """Dropped upright from a small height, a cylinder must stand at
    y = height/2 WITHOUT tipping — the capsule approximation would leave it
    balancing on a hemisphere and slowly rolling off."""
    s = _floor()
    c = s.create_entity("cyl")
    c.add("TransformComponent", position=(0.0, 0.8, 0.0))
    c.add("CylinderColliderComponent", radius=0.4, height=1.0, friction=0.6)
    c.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    ps = _settle(s)
    assert abs(float(ps.pos[1, 1]) - 0.5) < 0.06, float(ps.pos[1, 1])
    # still upright: rotation's Y column ≈ world Y
    from oxylus_tpu.utils import math3d

    r = np.asarray(math3d.quat_to_mat3(ps.quat[1:2]))[0]
    assert r[1, 1] > 0.99


def test_cylinder_lies_on_side_at_radius():
    """On its side, a cylinder rests with its axis at exactly r above ground."""
    s = _floor()
    c = s.create_entity("cyl")
    # axis along world X: rotate local Y → X (90° about Z)
    q = (0.0, 0.0, float(np.sin(np.pi / 4)), float(np.cos(np.pi / 4)))
    c.add("TransformComponent", position=(0.0, 0.6, 0.0), rotation=q)
    c.add("CylinderColliderComponent", radius=0.3, height=1.2, friction=0.6)
    c.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    ps = _settle(s)
    assert abs(float(ps.pos[1, 1]) - 0.3) < 0.05, float(ps.pos[1, 1])


def test_tapered_capsule_rests_on_bottom_sphere():
    """An upright tapered capsule (wide bottom) rests with its center at
    half_length + bottom_radius above the ground."""
    s = _floor()
    c = s.create_entity("tap")
    c.add("TransformComponent", position=(0.0, 1.5, 0.0))
    c.add(
        "TaperedCapsuleColliderComponent",
        height=1.0, bottom_radius=0.5, top_radius=0.2, friction=0.8,
    )
    c.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    ps = _settle(s)
    # resting height: bottom sphere (r=0.5) center at -0.5 from body center
    # → body center at 0.5 + 0.5 = 1.0
    assert abs(float(ps.pos[1, 1]) - 1.0) < 0.08, float(ps.pos[1, 1])
    np.testing.assert_allclose(
        [float(ps.radius[1]), float(ps.radius2[1])], [0.5, 0.2], rtol=1e-6
    )


def test_tapered_capsule_vs_sphere_uses_local_radius():
    """A sphere hitting the THIN top of a tapered capsule contacts at
    top_radius, not at max(bottom, top) — the round-1 approximation."""
    from oxylus_tpu.physics.step import _contact_capsule_capsule
    from oxylus_tpu.utils import math3d

    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    # tapered capsule at origin: bottom r=0.5 at y=-0.5, top r=0.1 at y=+0.5
    # sphere (r=0.25) directly beside the TOP end at x = 0.3
    n, pt, dp = _contact_capsule_capsule(
        jnp.zeros((1, 3)), eye, jnp.array([0.5]), jnp.array([0.5]), jnp.array([0.1]),
        jnp.array([[0.3, 0.5, 0.0]]), eye, jnp.array([0.0]),
        jnp.array([0.25]), jnp.array([0.25]),
    )
    # gap = 0.3 - (0.1 + 0.25) = -0.05 → depth = +0.05
    assert abs(float(dp[0]) - 0.05) < 1e-5, float(dp[0])
    # with the old max-radius approximation depth would be 0.45


def _terrain_mesh():
    """A 4-quad pyramid-ish terrain patch: flat ring at y=0, apex at (0,1,0)."""
    v = np.array(
        [
            [-4.0, 0.0, -4.0], [4.0, 0.0, -4.0], [4.0, 0.0, 4.0], [-4.0, 0.0, 4.0],
            [0.0, 1.0, 0.0],
        ],
        np.float32,
    )
    # CCW seen from above (+Y normals)
    idx = np.array([0, 4, 1, 1, 4, 2, 2, 4, 3, 3, 4, 0], np.int64)
    return v, idx


def test_mesh_collider_supports_bodies():
    """Bodies dropped on a MeshColliderComponent terrain must come to rest ON
    the surface — round 1 silently ignored the component and they fell forever."""
    s = Scene("terrain", spec=SceneSpec(max_entities=32, max_bodies=32))
    ter = s.create_entity("terrain")
    ter.add("TransformComponent", position=(0.0, 0.0, 0.0))
    ter.add("MeshComponent", mesh_index=0)
    ter.add("MeshColliderComponent", friction=0.6)
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(2.0, 3.0, 2.0))
    ball.add("SphereColliderComponent", radius=0.4, friction=0.6)
    # strong roll damping: without rolling resistance a sphere rolls off any
    # slope forever (Jolt behaves the same); the test wants it to settle
    ball.add("RigidBodyComponent", type="Dynamic", mass=1.0, angular_drag=8.0)
    box = s.create_entity("box")
    box.add("TransformComponent", position=(-2.0, 3.0, -2.0))
    box.add("BoxColliderComponent", size=(0.4, 0.4, 0.4), friction=0.6)
    box.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.set_collision_meshes({0: _terrain_mesh()})
    ps = _settle(s, steps=300)
    assert ps.mesh_tri is not None and int(ps.mesh_tri.shape[0]) == 4
    ent = np.asarray(ps.entity)
    slots = [int(np.nonzero(ent == e.index)[0][0]) for e in (ball, box)]
    ys = np.asarray(ps.pos)[slots, 1]
    # both bodies rest on the sloped surface (y in (0, 1.2)), not fallen through
    assert (ys > 0.05).all() and (ys < 1.4).all(), ys
    vs = np.asarray(ps.linvel)[slots]
    # the box is static; the ball may still creep slowly down-slope (spheres
    # have no rolling resistance) but must not be in free fall
    assert np.abs(vs).max() < 0.6, vs


def test_mesh_collider_slope_normal():
    """A ball dropped off-center on the pyramid rolls DOWN the slope (the
    contact normal is the true face normal, not a flat-up approximation)."""
    s = Scene("terrain2", spec=SceneSpec(max_entities=16, max_bodies=16))
    ter = s.create_entity("terrain")
    ter.add("TransformComponent", position=(0.0, 0.0, 0.0))
    ter.add("MeshComponent", mesh_index=0)
    ter.add("MeshColliderComponent", friction=0.0)
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(0.0, 2.5, -1.0))  # on the -z face
    ball.add("SphereColliderComponent", radius=0.3, friction=0.0)
    ball.add("RigidBodyComponent", type="Dynamic", mass=1.0, linear_drag=0.0)
    s.set_collision_meshes({0: _terrain_mesh()})
    s.runtime_start()
    ps = s.physics_state
    params = PhysicsParams(max_pairs=64)
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(90):
        ps = step(ps)
    slot = int(np.nonzero(np.asarray(ps.entity) == ball.index)[0][0])
    # slid toward -z (downhill) and still above the surface
    assert float(ps.pos[slot, 2]) < -1.5, float(ps.pos[slot, 2])
    assert float(ps.pos[slot, 1]) > 0.0
