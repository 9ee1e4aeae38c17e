"""Probe: Mosaic support for rhs-transposed dot_general ((2n,K)·(M,K)^T -> (2n,M)),
sublane slices of f32 (R,b) values, and lane-concat of 2D-ref lane slices —
the three primitives the K-stacked scatter restructure rests on."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, BCHUNK, SLAB, N2 = 8, 128, 384, 12
RB = R * BCHUNK
b = 1024


def kernel(v_ref, m_ref, o_ref, sc):
    # 1. sublane slices of an f32 (R, b) value + staging into a 2D (N2, R*b) ref
    v = v_ref[:, :]  # (R, b)
    for r in range(R):
        vr = v[r : r + 1, :]
        sc[0:1, pl.ds(r * b, b)] = vr.astype(jnp.bfloat16)
        sc[1:2, pl.ds(r * b, b)] = (vr - vr.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)
    # replicate rows 0/1 into all N2 staging rows
    for k in range(2, N2):
        sc[k : k + 1, :] = sc[(k % 2) : (k % 2) + 1, :]

    # 2. lane-concat of 2D-ref lane slices at matching sublane offsets
    cs = 0
    parts = [sc[0:N2, pl.ds(r * b + cs, BCHUNK)] for r in range(R)]
    vals = jnp.concatenate(parts, axis=1)  # (N2, RB)

    # 3. rhs-transposed dot_general: (N2, RB) x (SLAB, RB) -> (N2, SLAB)
    mb = m_ref[:, :]
    mm = jax.lax.dot_general(
        vals, mb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, :] = mm


v = jnp.asarray(np.random.default_rng(0).normal(size=(R, b)).astype(np.float32))
m = (np.random.default_rng(1).random((SLAB, RB)) < 0.01).astype(np.float32)
mj = jnp.asarray(m, jnp.bfloat16)

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((N2, SLAB), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((N2, R * b), jnp.bfloat16)],
)(v, mj)
out = jax.device_get(out)

# reference: hi+lo rows reconstruct v -> (hi row + lo row) @ m^T == vconcat @ m^T
vals_ref = np.concatenate([np.asarray(v)[r : r + 1, 0:BCHUNK] for r in range(R)], axis=1)
want = (vals_ref @ m.T)[0]
got = out[0] + out[1]
err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
print("max rel err:", err)
assert err < 2e-3, err
print("OK: rhs-transposed dot_general + 2D staging + lane concat all lower")
