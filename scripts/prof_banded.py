"""Attribute time inside megakernel_substeps_banded: phase1+2 vs solver sweeps.

Times the kernel at iterations {0,1,5,10} and substeps {1,60}. The iterations=0
point isolates geometry+effective-mass cost; the slope gives per-sweep cost.
"""

import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build_flagship
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics.megakernel_banded import megakernel_substeps_banded

scene = _build_flagship(n_boxes=1022)
ps = scene.physics_state
params = PhysicsParams()
dt = 1.0 / 60.0

n_bodies = int(jax.device_get(jnp.sum(ps.active.astype(jnp.int32))))
print("bodies:", n_bodies)

for iters in (0, 1, 5, 10):
    for nsub in (60,):
        f = jax.jit(lambda p: megakernel_substeps_banded(p, params, dt, n_substeps=nsub, iterations=iters))
        out = f(ps); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(ps)
        jax.block_until_ready(out)
        el = (time.perf_counter() - t0) / reps
        per_sub = el / nsub
        rate = n_bodies * nsub / el
        print(f"iters={iters:2d} nsub={nsub}: {el*1e3:8.2f} ms/launch  {per_sub*1e6:8.1f} us/substep  {rate/1e6:6.3f} M body-steps/s")
