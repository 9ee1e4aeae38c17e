"""Cumulative substep variants to find the hidden cost in the full physics substep."""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from oxylus_tpu.physics.state import BODY_DYNAMIC, BODY_STATIC, PhysicsParams
from oxylus_tpu.physics import step as S

REPEATS = 60
DT = 1.0 / 60.0


def variant(stage):
    def substep(ps, params, dt):
        dyn = (ps.body_type == BODY_DYNAMIC) & ps.active
        dynf = dyn.astype(jnp.float32)[:, None]
        prev_pos, prev_quat = ps.pos, ps.quat
        lv = ps.linvel + params.gravity[None, :] * (ps.gravity_factor[:, None] * dt) * dynf
        av = ps.angvel
        ps = dataclasses.replace(ps, linvel=lv, angvel=av)
        if stage >= 1:
            ia, ib, pair_valid = S.broadphase_pairs(ps, params, dt)
        if stage >= 2:
            normal, point, depth, valid, c_ia, c_ib, _ = S.narrowphase(ps, params, ia, ib, pair_valid)
        if stage >= 3:
            lv, av = S.solve_velocity(ps, params, dt, normal, point, depth, valid, c_ia, c_ib)
            lv = jnp.where(dyn[:, None], lv, ps.linvel)
            av = jnp.where(dyn[:, None], av, ps.angvel)
        kin_or_dyn = ps.active & (ps.body_type != BODY_STATIC)
        from oxylus_tpu.utils import math3d

        new_pos = jnp.where(kin_or_dyn[:, None], ps.pos + lv * dt, ps.pos)
        new_quat = jnp.where(kin_or_dyn[:, None], math3d.quat_integrate(ps.quat, av, dt), ps.quat)
        return dataclasses.replace(
            ps, pos=new_pos, quat=new_quat, linvel=lv, angvel=av, prev_pos=prev_pos, prev_quat=prev_quat
        )

    return substep


def timed(name, fn, arg):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(arg)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt / REPEATS * 1e3:8.3f} ms/iter")


def main():
    scene = _build_flagship(n_boxes=1022)
    ps = scene.physics_state
    params = PhysicsParams()

    for stage, name in [(0, "integrate only"), (1, "+broadphase"), (2, "+narrowphase"), (3, "+solver")]:
        sub = variant(stage)

        @jax.jit
        def run(p, sub=sub):
            def body(q, _):
                return sub(q, params, DT), ()

            out, _ = jax.lax.scan(body, p, None, length=REPEATS)
            return out

        timed(name, run, ps)


if __name__ == "__main__":
    main()
