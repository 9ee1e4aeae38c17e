"""Compound collider bodies: sub-collider proxy slots resolving against the root.

Reference behavior: an entity with multiple collider components becomes one Jolt
body with a StaticCompoundShape (`Scene.cpp:1717-1850`). Here: extra proxy slots
with `parent = root` generate contacts at `root pose + offset`; impulses apply to
the root with torque about its COM (physics/build.py, physics/step.py).
"""

import jax
import numpy as np
import pytest

from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.step import physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def _world(max_bodies=128):
    spec = SceneSpec(max_entities=256, max_bodies=max_bodies)
    s = Scene("compound", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(20.0, 1.0, 20.0), friction=0.6)
    return s


def run(ps, params, n):
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(n):
        ps = step(ps)
    return ps


def test_compound_build_creates_proxies():
    s = _world()
    e = s.create_entity("dumbbell")
    e.add("TransformComponent", position=(0.0, 3.0, 0.0))
    e.add("BoxColliderComponent", size=(0.3, 0.3, 0.3), offset=(-0.8, 0.0, 0.0))
    e.add("SphereColliderComponent", radius=0.3, offset=(0.8, 0.0, 0.0))
    e.add("RigidBodyComponent", mass=2.0)
    s.runtime_start()
    ps = s.physics_state

    assert ps.has_proxies
    parent = np.asarray(ps.parent)
    active = np.asarray(ps.active)
    proxies = np.nonzero(active & (parent >= 0))[0]
    assert len(proxies) == 1
    root = int(parent[proxies[0]])
    # proxy has no entity (transform sync stays unique), root owns the entity
    assert int(np.asarray(ps.entity)[proxies[0]]) == -1
    assert int(np.asarray(ps.entity)[root]) == 1
    # composite inertia includes parallel-axis terms: the dumbbell's inertia about
    # y must far exceed a single centered 0.3-box's
    iy = 1.0 / float(np.asarray(ps.inv_inertia)[root, 1])
    assert iy > 2.0 * 0.8**2 * 0.3  # at least the order of m*d^2


def test_compound_rests_on_floor():
    """A wide compound (two spheres on a bar) settles upright on the floor instead
    of falling through or exploding."""
    s = _world()
    e = s.create_entity("bar")
    e.add("TransformComponent", position=(0.0, 1.5, 0.0))
    e.add("SphereColliderComponent", radius=0.4, offset=(-0.9, 0.0, 0.0), friction=0.5)
    e.add("CapsuleColliderComponent", radius=0.4, height=0.8, offset=(0.9, 0.0, 0.0), friction=0.5)
    e.add("RigidBodyComponent", mass=4.0)
    s.runtime_start()
    ps = run(s.physics_state, PhysicsParams(), 240)

    root = 1  # floor is slot 0
    pos = np.asarray(ps.pos)[root]
    vel = np.asarray(ps.linvel)[root]
    assert pos[1] > -0.5, "compound fell through the floor"
    assert np.all(np.abs(pos) < 10.0), "compound exploded"
    assert np.linalg.norm(vel) < 0.5, "compound failed to settle"


def test_compound_torque_topples():
    """Contact on an off-center sub-collider produces torque about the ROOT: a
    one-sided compound resting its far sphere on a pedestal must rotate."""
    s = _world()
    ped = s.create_entity("pedestal")
    ped.add("TransformComponent", position=(1.5, 0.5, 0.0))
    ped.add("BoxColliderComponent", size=(0.3, 0.5, 0.3))
    e = s.create_entity("lever")
    e.add("TransformComponent", position=(0.0, 1.6, 0.0))
    e.add("SphereColliderComponent", radius=0.25, offset=(0.0, 0.0, 0.0))
    e.add("SphereColliderComponent", radius=0.25)  # dedup: only one sphere comp
    e.add("BoxColliderComponent", size=(0.25, 0.25, 0.25), offset=(1.5, 0.0, 0.0))
    e.add("RigidBodyComponent", mass=1.0)
    s.runtime_start()
    ps = run(s.physics_state, PhysicsParams(), 90)

    roots = np.asarray(ps.parent)
    # the lever body: entity 2's root slot
    ent = np.asarray(ps.entity)
    root = int(np.nonzero(ent == 2)[0][0])
    av = np.asarray(ps.angvel)[root]
    q = np.asarray(ps.quat)[root]
    # it must have picked up rotation about z (tipping) — contact only on the
    # offset box while gravity acts at the root COM
    rotated = abs(q[2]) > 1e-3 or abs(av[2]) > 1e-2
    assert rotated, f"no root torque from proxy contact (quat={q}, av={av})"


def test_single_collider_has_no_proxies():
    s = _world()
    e = s.create_entity("box")
    e.add("TransformComponent", position=(0.0, 2.0, 0.0))
    e.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    e.add("RigidBodyComponent")
    s.runtime_start()
    assert not s.physics_state.has_proxies
