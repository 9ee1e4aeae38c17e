"""Per-component physics timing probe on the real chip (or CPU with JAX_PLATFORMS=cpu).

Times each stage of the substep separately with lax.scan repeats so dispatch overhead
is amortized — identifies which stage eats the frame budget.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.physics import step as S

REPEATS = 60
DT = 1.0 / 60.0


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt / REPEATS * 1e3:8.3f} ms/iter  ({dt:.3f}s for {REPEATS})")
    return out


def main():
    scene = _build_flagship(n_boxes=1022)
    ps = scene.physics_state
    params = PhysicsParams()
    print("bodies:", int(jnp.sum(ps.active.astype(jnp.int32))))

    @jax.jit
    def full(p):
        def body(q, _):
            return S.physics_substep(q, params, DT), ()

        out, _ = jax.lax.scan(body, p, None, length=REPEATS)
        return out

    @jax.jit
    def broad_only(p):
        def body(c, _):
            ia, ib, valid = S.broadphase_pairs(p, params, DT)
            return c + jnp.sum(ia) + jnp.sum(valid), ()

        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=REPEATS)
        return out

    ia, ib, valid = jax.jit(lambda p: S.broadphase_pairs(p, params, DT))(ps)

    @jax.jit
    def narrow_only(p, ia, ib, valid):
        def body(c, _):
            n, pt, d, v, cia, cib, _t = S.narrowphase(p, params, ia, ib, valid)
            return c + jnp.sum(d) + jnp.sum(n), ()

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return out

    n, pt, d, v, cia, cib, _t = jax.jit(lambda p: S.narrowphase(p, params, ia, ib, valid))(ps)

    @jax.jit
    def solve_only(p, n, pt, d, v, cia, cib):
        def body(c, _):
            lv, av = S.solve_velocity(p, params, DT, n, pt, d, v, cia, cib)
            return c + jnp.sum(lv), ()

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return out

    timed("full substep", full, ps)
    timed("broadphase", broad_only, ps)
    timed("narrowphase", narrow_only, ps, ia, ib, valid)
    timed("solver (10 iter)", solve_only, ps, n, pt, d, v, cia, cib)


if __name__ == "__main__":
    main()
