"""Micro-benchmarks of the primitive ops the physics solver is built from.

Each variant runs inside lax.scan (100 reps) with carry-perturbed inputs so nothing is
hoisted out of the loop; results guide the solver's communication strategy.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B = 1024
C = 8192
REPS = 100

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, B, C), jnp.int32)
vals_c3 = jnp.asarray(rng.normal(size=(C, 3)), jnp.float32)
vals_c = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
body_v = jnp.asarray(rng.normal(size=(B, 6)), jnp.float32)
onehot = jax.nn.one_hot(idx, B, dtype=jnp.bfloat16)  # (C, B)
onehot_t = onehot.T  # (B, C)
vals_c6 = jnp.asarray(rng.normal(size=(C, 6)), jnp.float32)

sorted_idx = jnp.sort(idx)
order = jnp.argsort(idx)
ends = jnp.searchsorted(sorted_idx, jnp.arange(B), side="right")
starts = jnp.searchsorted(sorted_idx, jnp.arange(B), side="left")


def timed(name, fn):
    """fn(eps_scalar) -> pytree; runs REPS times inside one jit."""

    @jax.jit
    def run():
        def body(c, _):
            out = fn(c * 1e-20)
            s = jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.float32)), out, jnp.float32(0))
            return c + s * 1e-30 + 1.0, ()

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return out

    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:36s} {dt:9.1f} us/op", flush=True)


def main():
    timed("noop (overhead floor)", lambda e: (e,))
    timed("gather (C,3) from (B,3)", lambda e: ((body_v[:, :3] + e)[idx],))
    timed("gather (C,) from (B,)", lambda e: ((body_v[:, 0] + e)[idx],))
    timed("gather x6 components", lambda e: tuple((body_v[:, k] + e)[idx] for k in range(6)))
    timed("gather (C,6) rows", lambda e: ((body_v + e)[idx],))
    timed(
        "onehot gather (C,B)@(B,6) bf16",
        lambda e: (jnp.dot(onehot, (body_v + e).astype(jnp.bfloat16), preferred_element_type=jnp.float32),),
    )
    timed(
        "onehot reduce (B,C)@(C,6) bf16",
        lambda e: (jnp.dot(onehot_t, (vals_c6 + e).astype(jnp.bfloat16), preferred_element_type=jnp.float32),),
    )
    timed("cumsum (C,)", lambda e: (jnp.cumsum(vals_c + e),))
    timed("cumsum (C,3) axis0", lambda e: (jnp.cumsum(vals_c3 + e, axis=0),))
    timed("cumsum (C,6) axis0", lambda e: (jnp.cumsum(vals_c6 + e, axis=0),))
    timed("sort (C,) pairs", lambda e: jax.lax.sort((idx, vals_c + e), num_keys=1))
    timed("argsort idx (C,)", lambda e: (jnp.argsort(idx + (e * 0).astype(jnp.int32)),))
    timed(
        "searchsorted B in C",
        lambda e: (jnp.searchsorted(sorted_idx + (e * 0).astype(jnp.int32), jnp.arange(B)),),
    )

    def seg_reduce_rows(e):
        v = (vals_c6 + e)[order]
        cs = jnp.concatenate([jnp.zeros((1, 6)), jnp.cumsum(v, axis=0)])
        return (cs[ends] - cs[starts],)

    timed("segment reduce rows (C,6)", seg_reduce_rows)
    timed("elementwise 10 sin (C,)", lambda e: (sum(jnp.sin(vals_c + e * k) for k in range(1, 11)),))
    timed("elementwise 10 sin (C,3)", lambda e: (sum(jnp.sin(vals_c3 + e * k) for k in range(1, 11)),))
    timed("elementwise 10 sin (C,6)", lambda e: (sum(jnp.sin(vals_c6 + e * k) for k in range(1, 11)),))


if __name__ == "__main__":
    main()
