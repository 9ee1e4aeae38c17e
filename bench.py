"""Benchmark driver. Prints ONE JSON line with the headline metric.

Round-1 headline: BASELINE config 1 — falling-boxes rigid-body throughput
(~1k bodies/world, fixed 60 Hz substeps), target ≥10M rigid-body-steps/s.

Throughput deployment shape: the engine runs a *batch of independent worlds* vmapped
into one jit (the standard TPU simulation-farm pattern — same program, W worlds of
state side by side). Per-kernel dispatch overhead on the target (~100-300µs/kernel,
see scripts/micro_probe.py) amortizes across the batch; `OX_BENCH_WORLDS` overrides
the batch width (default 64; 1 = single-scene latency mode).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def bench_physics(n_boxes=1022, worlds=64, steps_per_call=60, calls=3, warmup=1):
    from __graft_entry__ import _build_flagship
    from oxylus_tpu.physics.state import PhysicsParams
    from oxylus_tpu.physics.step import physics_substep

    scene = _build_flagship(n_boxes=n_boxes)
    ps = scene.physics_state
    comm = "scatter" if worlds > 4 else "matmul"
    params = PhysicsParams(comm=comm)
    n_bodies = int(jax.device_get(jnp.sum(ps.active.astype(jnp.int32))))
    dt = 1.0 / 60.0

    if worlds > 1:
        ps = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (worlds,) + x.shape), ps)
        step_fn = jax.vmap(lambda p: physics_substep(p, params, dt))
    else:
        step_fn = lambda p: physics_substep(p, params, dt)

    @jax.jit
    def run(ps):
        def body(p, _):
            return step_fn(p), ()

        out, _ = jax.lax.scan(body, ps, None, length=steps_per_call)
        return out

    for _ in range(warmup):
        ps = run(ps)
    jax.block_until_ready(ps)

    t0 = time.perf_counter()
    for _ in range(calls):
        ps = run(ps)
    jax.block_until_ready(ps)
    elapsed = time.perf_counter() - t0

    body_steps = n_bodies * worlds * steps_per_call * calls
    rate = body_steps / elapsed
    return rate, n_bodies, worlds, elapsed


def main():
    worlds = int(os.environ.get("OX_BENCH_WORLDS", "64"))
    rate, n_bodies, worlds, elapsed = bench_physics(worlds=worlds)
    target = 10e6  # BASELINE.json: ≥10M rigid-body-steps/s
    print(
        json.dumps(
            {
                "metric": f"rigid-body-steps/sec (falling boxes, {worlds}x{n_bodies} bodies, 60Hz substeps)",
                "value": round(rate),
                "unit": "body-steps/s",
                "vs_baseline": round(rate / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
