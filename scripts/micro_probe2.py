"""Batched-op micro-benchmarks: how do the solver's primitives scale with a world batch?"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B = 1024
P = 4096
W = 64
REPS = 20

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, B, (W, P)), jnp.int32)
body_v = jnp.asarray(rng.normal(size=(W, B, 6)), jnp.float32)
vals = jnp.asarray(rng.normal(size=(W, P, 6)), jnp.float32)
big = jnp.asarray(rng.normal(size=(W, B, B)), jnp.float32)  # 256MB
flat_idx = (jnp.arange(W, dtype=jnp.int32)[:, None] * B + idx).reshape(-1)
body_flat = body_v.reshape(W * B, 6)
vals_flat = vals.reshape(W * P, 6)


def timed(name, fn):
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
    print(f"{name:44s} {dt:10.1f} us/op", flush=True)


def main():
    timed("noop", lambda e: (e,))
    timed("elementwise (W,B,B) 256MB fused x3", lambda e: (jnp.sin(big + e) * 1.5 + 0.1,))
    timed("reduce sum (W,B,B) axis2", lambda e: (jnp.sum(big + e, axis=2),))
    timed("vmapped gather (W,P,6)", lambda e: (jax.vmap(lambda v, i: v[i])(body_v + e, idx),))
    timed("flat gather (W*P,6)", lambda e: ((body_flat + e)[flat_idx],))
    timed(
        "vmapped scatter-add (W,B,6)",
        lambda e: (jax.vmap(lambda v, i: jnp.zeros((B, 6)).at[i].add(v))(vals + e, idx),),
    )
    timed(
        "flat scatter-add (W*B,6)",
        lambda e: (jnp.zeros((W * B, 6)).at[flat_idx].add(vals_flat + e),),
    )
    timed(
        "batched matmul (W,P,B)@(W,B,6) bf16",
        lambda e: (
            jnp.einsum(
                "wpb,wbf->wpf",
                jnp.ones((W, P, B), jnp.bfloat16),
                (body_v + e).astype(jnp.bfloat16),
            ).astype(jnp.float32),
        ),
    )
    timed("cumsum (W,P) axis1", lambda e: (jnp.cumsum(vals[..., 0] + e, axis=1),))
    timed("sort (W,P) axis1", lambda e: (jnp.sort(vals[..., 0] + e, axis=1),))


if __name__ == "__main__":
    main()
