"""Compacted-neighbor mega-kernel tests (interpret mode — exercises the exact
kernel code, including the one-hot matmul gather/scatter and the lambda-cache
slot remap)."""

import numpy as np

from oxylus_tpu.physics.megakernel_banded import megakernel_substeps_banded
from oxylus_tpu.physics.megakernel_compact import R, megakernel_substeps_compact
from oxylus_tpu.physics.state import PhysicsParams

from tests.test_megakernel_banded import _falling_boxes

DT = 1.0 / 60.0


def test_compact_matches_banded_short_horizon():
    """Same discovery contract + same solver math on compacted lanes: the two
    kernels must track each other closely while contacts form."""
    ps = _falling_boxes(n_boxes=40, max_bodies=256)
    params = PhysicsParams()

    banded = megakernel_substeps_banded(
        ps, params, DT, n_substeps=6, iterations=3, warm=0.7, geom_every=2,
        interpret=True,
    )
    compact, dropped = megakernel_substeps_compact(
        ps, params, DT, n_substeps=6, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True,
    )
    assert float(dropped) == 0.0, "R neighbor slots overflowed on the test scene"
    np.testing.assert_allclose(
        np.asarray(compact.pos), np.asarray(banded.pos), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(compact.linvel), np.asarray(banded.linvel), atol=5e-2
    )


def test_compact_long_horizon_stable():
    """One 18-substep launch: bodies stay above the floor, nothing explodes,
    and the lambda remap across SAT rebuilds keeps resting stacks stable."""
    ps = _falling_boxes(n_boxes=40, max_bodies=256)
    n_dyn = int(np.asarray(ps.active).sum()) - 1
    out = megakernel_substeps_compact(
        ps, PhysicsParams(), DT, n_substeps=18, iterations=3, warm=0.7,
        geom_every=2, interpret=True,
    )
    pos = np.asarray(out.pos)[1 : 1 + n_dyn]
    vel = np.asarray(out.linvel)[1 : 1 + n_dyn]
    assert np.all(pos[:, 1] > -0.5), "bodies fell through the floor"
    assert np.all(np.abs(pos) < 50.0), "explosion"
    assert np.all(np.abs(vel) < 30.0), "velocity blow-up"


def test_compact_sleeping_and_overflow_diag():
    """Sleep masks propagate through the compact path and the overflow
    diagnostic reports dropped candidates (R slots exceeded) honestly."""
    ps = _falling_boxes(n_boxes=40, max_bodies=256)
    out, dropped = megakernel_substeps_compact(
        ps, PhysicsParams(), DT, n_substeps=18, iterations=3, warm=0.7,
        geom_every=2, sleep=True, interpret=True, with_overflow=True,
    )
    assert float(dropped) >= 0.0
    assert np.asarray(out.asleep).dtype == np.bool_
    # nothing explodes with sleeping enabled either
    n_dyn = int(np.asarray(ps.active).sum()) - 1
    pos = np.asarray(out.pos)[1 : 1 + n_dyn]
    assert np.all(pos[:, 1] > -0.5)
    assert R == 16  # capacity documented in the kernel module


def test_compact_nonresident_matches_resident():
    """Large-capacity mode (resident_m=False: fori_loop chunk iteration +
    on-the-fly one-hot blocks — the 10k-body path) must produce the SAME
    trajectories as the resident unrolled path on an identical scene."""
    ps = _falling_boxes(n_boxes=40, max_bodies=256)
    params = PhysicsParams()
    res, d_res = megakernel_substeps_compact(
        ps, params, DT, n_substeps=8, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True, resident_m=True,
    )
    non, d_non = megakernel_substeps_compact(
        ps, params, DT, n_substeps=8, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True, resident_m=False,
    )
    assert float(d_res) == float(d_non) == 0.0
    np.testing.assert_allclose(np.asarray(non.pos), np.asarray(res.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(non.quat), np.asarray(res.quat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(non.linvel), np.asarray(res.linvel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(non.angvel), np.asarray(res.angvel), atol=1e-4)


def test_compact_band_and_rslots_params():
    """Widened rank band (256) + narrowed neighbor slots (r_slots=8) — the
    knobs the flagship/10k benches use — must not change trajectories when
    neither window overflows. (band=256 needs capacity >= SLAB=384.)"""
    ps = _falling_boxes(n_boxes=40, max_bodies=512)
    params = PhysicsParams()
    base, d0 = megakernel_substeps_compact(
        ps, params, DT, n_substeps=8, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True,
    )
    from oxylus_tpu.physics.megakernel_banded import count_hub_planes

    n_planes = count_hub_planes(ps)
    assert n_planes >= 1  # the falling-boxes floor is a hub plane
    wide, d1 = megakernel_substeps_compact(
        ps, params, DT, n_substeps=8, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True, band=256, r_slots=8,
        resident_m=False, n_planes=n_planes,
    )
    assert float(d0) == float(d1) == 0.0
    np.testing.assert_allclose(np.asarray(wide.pos), np.asarray(base.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wide.linvel), np.asarray(base.linvel), atol=1e-4)

    # band=256 with resident_m=True — the flagship bench config (bench.py picks
    # band>=256 at b=1024 where resident_m defaults True). Guards the round-4
    # fix: the resident one-hot M build must window with the band-shadowed SLAB
    # (ws_of), not the module default, or tail-chunk gathers hit shifted bodies.
    wide_res, d2 = megakernel_substeps_compact(
        ps, params, DT, n_substeps=8, iterations=3, warm=0.7, geom_every=2,
        interpret=True, with_overflow=True, band=256, r_slots=8,
        resident_m=True, n_planes=n_planes,
    )
    assert float(d2) == 0.0
    np.testing.assert_allclose(np.asarray(wide_res.pos), np.asarray(base.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wide_res.linvel), np.asarray(base.linvel), atol=1e-4)
