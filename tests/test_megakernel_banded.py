"""Banded mega-kernel tests (interpret mode — exercises the exact kernel code)."""

import jax
import numpy as np
import pytest

from oxylus_tpu.physics.megakernel import megakernel_substeps
from oxylus_tpu.physics.megakernel_banded import (
    BAND,
    megakernel_substeps_banded,
    slab_rank_key,
)
from oxylus_tpu.physics.state import SHAPE_BOX, PhysicsParams
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def _falling_boxes(n_boxes=60, seed=0, max_bodies=512):
    """Ground slab + a loose grid of falling boxes (same family as the bench scene)."""
    rng = np.random.default_rng(seed)
    spec = SceneSpec(max_entities=1024, max_bodies=max_bodies)
    s = Scene("banded", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(12.0, 1.0, 12.0), friction=0.5)
    side = int(np.ceil(n_boxes ** (1 / 3)))
    i = 0
    for gx in range(side):
        for gy in range(side):
            for gz in range(side):
                if i >= n_boxes:
                    break
                jitter = rng.uniform(-0.05, 0.05, 3)
                e = s.create_entity(f"box{i}")
                e.add(
                    "TransformComponent",
                    position=(
                        (gx - side / 2) * 1.2 + float(jitter[0]),
                        2.0 + gy * 1.2 + float(jitter[1]),
                        (gz - side / 2) * 1.2 + float(jitter[2]),
                    ),
                )
                e.add("BoxColliderComponent", size=(0.4, 0.4, 0.4), friction=0.5)
                e.add("RigidBodyComponent")
                i += 1
    s.runtime_start()
    return s.physics_state


def test_banded_matches_dense_short_horizon():
    """With every overlapping pair inside the band, banded == dense (up to fp
    accumulation-order noise)."""
    ps = _falling_boxes()
    params = PhysicsParams()

    dense = megakernel_substeps(ps, params, DT, n_substeps=5, interpret=True)
    banded = megakernel_substeps_banded(ps, params, DT, n_substeps=5, interpret=True)

    np.testing.assert_allclose(np.asarray(banded.pos), np.asarray(dense.pos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(banded.linvel), np.asarray(dense.linvel), atol=2e-2
    )


def test_banded_long_horizon_stable():
    """60 substeps in one launch: bodies settle above the floor, nothing explodes."""
    ps = _falling_boxes()
    n_dyn = int(np.asarray(ps.active).sum()) - 1
    out = megakernel_substeps_banded(ps, PhysicsParams(), DT, n_substeps=60, interpret=True)
    pos = np.asarray(out.pos)[1 : 1 + n_dyn]
    vel = np.asarray(out.linvel)[1 : 1 + n_dyn]
    assert np.all(pos[:, 1] > -0.5), "bodies fell through the floor"
    assert np.all(np.abs(pos) < 50.0), "explosion"
    assert np.all(np.abs(vel) < 30.0), "velocity blow-up"


def test_band_covers_scene_pairs():
    """Sanity: in the test scene, every AABB-overlapping pair is within BAND ranks
    of the slab order (the premise of the banded == dense comparison)."""
    ps = _falling_boxes()
    key = np.asarray(slab_rank_key(ps))
    rank = np.empty(len(key), np.int64)
    rank[np.argsort(key, kind="stable")] = np.arange(len(key))
    pos = np.asarray(ps.pos)
    half = np.where(
        np.asarray(ps.shape_type)[:, None] == SHAPE_BOX,
        np.asarray(ps.half_extent),
        np.asarray(ps.radius)[:, None] + np.asarray(ps.half_length)[:, None],
    )
    active = np.asarray(ps.active)
    idx = np.nonzero(active)[0]
    worst = 0
    for a in idx:
        for b in idx:
            if a >= b:
                continue
            if np.all(np.abs(pos[a] - pos[b]) <= half[a] + half[b] + 0.1):
                worst = max(worst, abs(int(rank[a]) - int(rank[b])))
    assert worst <= BAND, f"scene pair at rank distance {worst} exceeds band {BAND}"


def test_slab_key_sorts_inactive_last():
    ps = _falling_boxes(n_boxes=4)
    key = np.asarray(slab_rank_key(ps))
    active = np.asarray(ps.active)
    assert key[active].max() < key[~active].min()


def test_warm_start_stable():
    """The warm-started accumulated-impulse config (the bench configuration)
    settles the pile without explosion or floor tunneling."""
    ps = _falling_boxes()
    n_dyn = int(np.asarray(ps.active).sum()) - 1
    out = megakernel_substeps_banded(
        ps, PhysicsParams(), DT, n_substeps=60, iterations=4, warm=1.0, interpret=True
    )
    pos = np.asarray(out.pos)[1 : 1 + n_dyn]
    vel = np.asarray(out.linvel)[1 : 1 + n_dyn]
    assert np.all(pos[:, 1] > -0.5), "bodies fell through the floor"
    assert np.all(np.abs(pos) < 50.0), "explosion"
    assert np.all(np.abs(vel) < 30.0), "velocity blow-up"


def test_banded_adversarial_lateral_scatter():
    """Adversarial case for the ±BAND rank window (ADVICE/VERDICT round 1): bodies
    scattered widely in XZ with fast LATERAL velocities — the worst case for a
    spatial-rank band, since pairs can form between bodies whose launch-time
    ranks are far apart. The contract: per-LAUNCH error vs the dense kernel stays
    bounded (missed pairs are re-detected at the next launch's re-sort), and the
    band diagnostic quantifies the coverage gap.

    Fallback policy (documented here as the test's premise): scenes with
    dominantly lateral fast motion should either shorten n_substeps per launch
    (re-sorting more often) or use the dense megakernel / XLA path — the bench
    keeps banding because its workload is gravity-dominated."""
    import dataclasses

    import jax.numpy as jnp

    from oxylus_tpu.physics.megakernel_banded import band_coverage_report

    rng = np.random.default_rng(7)
    spec = SceneSpec(max_entities=512, max_bodies=256)
    s = Scene("lateral", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(40.0, 1.0, 40.0), friction=0.3)
    n = 120
    for i in range(n):
        e = s.create_entity(f"b{i}")
        e.add(
            "TransformComponent",
            position=(
                float(rng.uniform(-15, 15)), float(rng.uniform(0.4, 0.6)),
                float(rng.uniform(-15, 15)),
            ),
        )
        e.add("BoxColliderComponent", size=(0.4, 0.4, 0.4), friction=0.3)
        e.add("RigidBodyComponent", linear_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    # fast lateral velocities toward the middle → crossing trajectories
    vel = np.zeros((256, 3), np.float32)
    act = np.asarray(ps.active)
    pos = np.asarray(ps.pos)
    for i in range(256):
        if act[i] and i > 0:
            d = -pos[i]
            d[1] = 0.0
            nl = np.linalg.norm(d) or 1.0
            vel[i] = d / nl * rng.uniform(3.0, 8.0)
    ps = dataclasses.replace(ps, linvel=jnp.asarray(vel))

    rep = band_coverage_report(ps)
    # the diagnostic reports the initial coverage; for the scattered scene most
    # pairs are within band at launch (it's DRIFT during the launch that escapes)
    assert rep["pairs"] >= 0

    params = PhysicsParams()
    dense = megakernel_substeps(ps, params, DT, n_substeps=10, interpret=True)
    banded = megakernel_substeps_banded(ps, params, DT, n_substeps=10, interpret=True)
    # bounded divergence over one 10-substep launch: positions must not differ
    # grossly (a missed pair shows up as an unresolved overlap, not an explosion)
    dyn = act & (np.asarray(ps.body_type) == 2)
    dp = np.abs(np.asarray(dense.pos) - np.asarray(banded.pos))[dyn]
    assert np.isfinite(np.asarray(banded.pos)).all()
    assert dp.max() < 0.6, dp.max()
    # no tunneling through the floor on either path
    assert np.asarray(banded.pos)[dyn, 1].min() > -0.65
