"""Warm-start banded kernel: TPU validation + timing vs the cold kernel."""

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


def rollout(iters, warm, launches=5, nsub=60):
    f = jax.jit(
        lambda p: megakernel_substeps_banded(
            p, params, dt, n_substeps=nsub, iterations=iters, warm=warm
        )
    )
    ps = f(ps0)  # compile + first launch
    jax.block_until_ready(ps.pos)
    t0 = time.perf_counter()
    for _ in range(launches - 1):
        ps = f(ps)
    jax.block_until_ready(ps.pos)
    el = (time.perf_counter() - t0) / (launches - 1)
    rate = n_bodies * nsub / el
    return ps, el, rate


for iters, warm in [(10, 0.0), (4, 1.0), (3, 1.0), (2, 1.0)]:
    ps, el, rate = rollout(iters, warm)
    act = np.asarray(ps.active) & (np.asarray(ps.body_type) == 2)  # dynamics only
    pos = np.asarray(ps.pos)[act]
    vel = np.asarray(ps.linvel)[act]
    ymin, ymax = pos[:, 1].min(), pos[:, 1].max()
    print(
        f"iters={iters} warm={warm}: {el*1e3:7.2f} ms/launch  {rate/1e6:6.3f} M steps/s   "
        f"y=[{ymin:7.3f},{ymax:7.3f}] max|v|={np.abs(vel).max():7.3f} "
        f"{'FLOOR-BREAK' if ymin < -0.5 else 'ok'}"
    )
