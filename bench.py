"""Benchmark driver. Prints ONE JSON line with the headline metric.

Round-1 headline: BASELINE config 1 — falling-boxes rigid-body throughput
(~1k bodies, fixed 60 Hz substeps), target ≥10M rigid-body-steps/s (BASELINE.md).
Steps are batched through `lax.scan` inside one jit so dispatch overhead is amortized,
the same way a production sim loop runs frames back-to-back on device.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def bench_physics(n_boxes=1022, steps_per_call=120, calls=5, warmup=2):
    from __graft_entry__ import _build_flagship
    from oxylus_tpu.physics.state import PhysicsParams
    from oxylus_tpu.physics.step import physics_substep

    scene = _build_flagship(n_boxes=n_boxes)
    ps = scene.physics_state
    params = PhysicsParams()
    n_bodies = int(jax.device_get(jnp.sum(ps.active.astype(jnp.int32))))
    dt = 1.0 / 60.0

    @jax.jit
    def run(ps):
        def body(p, _):
            return physics_substep(p, params, dt), ()

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

    body_steps = n_bodies * steps_per_call * calls
    rate = body_steps / elapsed
    return rate, n_bodies, elapsed


def main():
    rate, n_bodies, elapsed = bench_physics()
    target = 10e6  # BASELINE.json: ≥10M rigid-body-steps/s
    print(
        json.dumps(
            {
                "metric": f"rigid-body-steps/sec (falling boxes, {n_bodies} bodies, 60Hz substeps)",
                "value": round(rate),
                "unit": "body-steps/s",
                "vs_baseline": round(rate / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
