"""Quick quality check for the warm-started banded kernel (CPU interpret mode)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tests.test_megakernel_banded import _falling_boxes
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.megakernel_banded import megakernel_substeps_banded

ps0 = _falling_boxes(n_boxes=60, max_bodies=512)
params = PhysicsParams()
dt = 1.0 / 60.0

# settle for 120 substeps in 2 launches, compare iterations=10 cold vs 4 warm
def rollout(ps, iters, warm, launches=2, nsub=60):
    for _ in range(launches):
        ps = megakernel_substeps_banded(
            ps, params, dt, n_substeps=nsub, iterations=iters, warm=warm, interpret=True
        )
    return ps

cold = rollout(ps0, 10, 0.0)
warm = rollout(ps0, 4, 1.0)
pc = np.asarray(cold.pos)[np.asarray(cold.active)]
pw = np.asarray(warm.pos)[np.asarray(warm.active)]
vc = np.asarray(cold.linvel)[np.asarray(cold.active)]
vw = np.asarray(warm.linvel)[np.asarray(warm.active)]
print("cold10 y-range", pc[:, 1].min(), pc[:, 1].max(), "max|v|", np.abs(vc).max())
print("warm4  y-range", pw[:, 1].min(), pw[:, 1].max(), "max|v|", np.abs(vw).max())
print("pos diff p50/p95/max:", *np.percentile(np.abs(pc - pw), [50, 95, 100]))
assert np.all(pw[:, 1] > -0.5), "warm: bodies fell through floor"
assert np.abs(pw).max() < 50.0, "warm: explosion"
assert np.abs(vw).max() < 30.0, "warm: velocity blowup"
# resting boxes should sit near y=0.25 (half extent) on the floor at y=-1+1=0 surface
print("OK: warm-start stable")
