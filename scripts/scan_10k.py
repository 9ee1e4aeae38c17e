"""Phase-attribution scan for the 10k-body compact megakernel (one process).

Times segment rates for a matrix of static configs on the SAME 10k rubble
scene; config diffs inside one process are the only trustworthy attribution
over the axon tunnel (PERF_NOTES.md measurement rule). Ablations:
  - band 128 vs 256          -> discovery/gather K-dim cost
  - geom_every 2 vs 4        -> SAT + discovery amortization
  - iterations 3 vs 1        -> sweep-phase cost (NOT a production config)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build_flagship
from oxylus_tpu.physics.megakernel_banded import band_coverage_report, count_hub_planes
from oxylus_tpu.physics.megakernel_compact import megakernel_substeps_compact
from oxylus_tpu.physics.state import PhysicsParams

N = int(os.environ.get("OX_SCAN_N", "10000"))
scene = _build_flagship(
    n_boxes=N, n_piles=10,
    spec_kw=dict(max_entities=16384, max_bodies=10112, max_particles=1024),
)
ps = scene.physics_state
n_planes = count_hub_planes(ps)
n_bodies = int(jax.device_get(jnp.sum(ps.active.astype(jnp.int32))))
params = PhysicsParams(comm="matmul")
dt = 1.0 / 60.0
STEPS = 60

rep = band_coverage_report(ps)
print(f"scene: {n_bodies} bodies, planes={n_planes}, t0 coverage: {rep}", flush=True)

CONFIGS = [
    ("band128_ge2_it3", dict(band=128, geom_every=2, iterations=3)),
    ("band256_ge2_it3", dict(band=256, geom_every=2, iterations=3)),
    ("band256_ge4_it3", dict(band=256, geom_every=4, iterations=3)),
    ("band256_ge2_it1", dict(band=256, geom_every=2, iterations=1)),
    ("band128_ge2_it1", dict(band=128, geom_every=2, iterations=1)),
    # DEBUG ablations (wrong physics, timing attribution only), vs band256_ge2_it3
    ("abl_warm",    dict(band=256, geom_every=2, iterations=3, ablate=("warm",))),
    ("abl_refresh", dict(band=256, geom_every=2, iterations=3, ablate=("refresh",))),
    ("abl_planes",  dict(band=256, geom_every=2, iterations=3, ablate=("planes",))),
    ("abl_sgather", dict(band=256, geom_every=2, iterations=3, ablate=("sweep_gather",))),
    ("abl_sscatter", dict(band=256, geom_every=2, iterations=3, ablate=("sweep_scatter",))),
    ("abl_all_sw",  dict(band=256, geom_every=2, iterations=3,
                         ablate=("warm", "refresh", "sweep_gather", "sweep_scatter"))),
]
only = os.environ.get("OX_SCAN_ONLY")
if only:
    CONFIGS = [c for c in CONFIGS if c[0] in only.split(",")]

for name, kw in CONFIGS:
    t0 = time.perf_counter()

    def run(state, n_sub):
        return megakernel_substeps_compact(
            state, params, dt, n_substeps=n_sub, warm=0.7,
            n_planes=n_planes, **kw,
        )

    out = run(ps, STEPS)
    jax.block_until_ready(out.pos)
    compile_s = time.perf_counter() - t0

    rates = []
    state = ps
    for _ in range(4):
        t0 = time.perf_counter()
        state = run(state, STEPS)
        jax.block_until_ready(state.pos)
        el = time.perf_counter() - t0
        rates.append(n_bodies * STEPS / el)
    med = sorted(rates)[len(rates) // 2]
    us = n_bodies * STEPS / med / STEPS * 1e6 / n_bodies * n_bodies  # noqa
    print(
        f"{name}: median {med/1e6:.2f}M body-steps/s "
        f"({1e6 * STEPS * n_bodies / med / STEPS / 1e3:.0f} us/substep) "
        f"compile {compile_s:.0f}s  rates={[f'{r/1e6:.2f}M' for r in rates]}",
        flush=True,
    )
