"""Grid-search warm decay / iterations for the banded kernel on TPU.

Quality gauge: after 5 launches (300 substeps) the flagship pile should have
settled like the cold 10-iteration reference — compare max height, max |v|,
and mean dynamic-body kinetic energy.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.megakernel_banded import megakernel_substeps_banded

scene = _build_flagship(n_boxes=1022)
ps0 = scene.physics_state
params = PhysicsParams()
dt = 1.0 / 60.0
n_bodies = int(jax.device_get(jnp.sum(ps0.active.astype(jnp.int32))))


def rollout(iters, warm, launches=5, nsub=60, geom_every=1):
    f = jax.jit(
        lambda p: megakernel_substeps_banded(
            p, params, dt, n_substeps=nsub, iterations=iters, warm=warm,
            geom_every=geom_every,
        )
    )
    ps = f(ps0)
    jax.block_until_ready(ps.pos)
    t0 = time.perf_counter()
    for _ in range(launches - 1):
        ps = f(ps)
    jax.block_until_ready(ps.pos)
    el = (time.perf_counter() - t0) / (launches - 1)
    return ps, el, n_bodies * nsub / el


import json as _json
configs = _json.loads(os.environ.get(
    "OX_TUNE", '[[10,0.0,1],[3,0.7,1],[3,0.7,2],[3,0.7,3],[2,0.6,2]]'
))
for iters, warm, ge in configs:
    ps, el, rate = rollout(iters, warm, geom_every=int(ge))
    act = np.asarray(ps.active) & (np.asarray(ps.body_type) == 2)
    pos = np.asarray(ps.pos)[act]
    vel = np.asarray(ps.linvel)[act]
    ke = 0.5 * (vel**2).sum(axis=1).mean()
    print(
        f"iters={iters} warm={warm} ge={ge}: {el*1e3:7.2f} ms/launch {rate/1e6:6.3f} M/s  "
        f"y=[{pos[:,1].min():6.3f},{pos[:,1].max():6.3f}] max|v|={np.abs(vel).max():6.2f} "
        f"meanKE={ke:7.4f} {'FLOOR' if pos[:,1].min() < -0.5 else 'ok'}"
    )
