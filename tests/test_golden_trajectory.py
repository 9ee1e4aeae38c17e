"""Golden-trajectory regression: the solver must reproduce a stored 5-second rollout.

This is the repo's trajectory-stability contract (SURVEY §4: Jolt-trajectory tolerance
testing): any solver change that alters dynamics beyond tolerance fails here and must
regenerate the golden (tests/data/golden_trajectory.npz) deliberately.
"""

from pathlib import Path

import jax
import numpy as np

from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.step import physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

GOLDEN = Path(__file__).parent / "data" / "golden_trajectory.npz"


def build_golden_scene():
    s = Scene("golden", spec=SceneSpec(max_entities=64, max_bodies=64))
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(30.0, 1.0, 30.0), friction=0.6)
    rng = np.random.default_rng(42)
    for i in range(12):
        b = s.create_entity(f"b{i}")
        b.add(
            "TransformComponent",
            position=(float(rng.uniform(-1, 1)), 1.0 + 0.9 * i, float(rng.uniform(-1, 1))),
        )
        if i % 3 == 2:
            b.add("SphereColliderComponent", radius=0.4, friction=0.5)
        else:
            b.add("BoxColliderComponent", size=(0.4, 0.4, 0.4), friction=0.5)
        b.add("RigidBodyComponent")
    return s


def test_trajectory_matches_golden():
    golden = np.load(GOLDEN)["traj"]
    s = build_golden_scene()
    s.runtime_start()
    params = PhysicsParams(max_pairs=256)
    ps = s.physics_state
    step = jax.jit(lambda p: physics_substep(p, params, 1 / 60))
    traj = []
    for k in range(300):
        ps = step(ps)
        if k % 30 == 29:
            traj.append(np.asarray(ps.pos[:13]))
    traj = np.stack(traj)
    # early snapshots must match tightly (deterministic fixed-iteration solver);
    # later ones more loosely (chaotic pile dynamics amplify platform rounding)
    np.testing.assert_allclose(traj[0], golden[0], atol=1e-3)
    np.testing.assert_allclose(traj[2], golden[2], atol=0.05)
    assert np.abs(traj[-1] - golden[-1]).max() < 0.5
    # no explosion / tunneling ever (body slots 1.. are the dynamic bodies;
    # slot 0 is the static floor at y = -1)
    assert traj[:, 1:, 1].min() > -0.1
    assert np.abs(traj).max() < 50.0
