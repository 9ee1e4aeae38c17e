"""Probe: Mosaic support for fori_loop-over-chunks with dynamic 128-aligned
lane slices of VMEM refs (the 10k-body compact-kernel enabler).

Checks, in one kernel:
  1. read  ref[0:2, pl.ds(ws, SLAB)]        (dynamic lane offset, value use)
  2. matmul with an on-the-fly one-hot built from a dynamically-sliced ref read
  3. write ref[0:2, pl.ds(c*128, 128)] accumulation
  4. read/write a 3-D ref g3[row, r, pl.ds(...)]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024
BCHUNK = 128
BAND = 128
SLAB = 256
NC = B // BCHUNK


def kernel(x_ref, d_ref, out_ref, g3):
    out_ref[:, :] = jnp.zeros((2, B), jnp.float32)

    def body(c, _):
        ws = jnp.maximum(0, jnp.minimum(c * BCHUNK, B - SLAB))
        ws = pl.multiple_of(ws, 128)
        cs = pl.multiple_of(c * BCHUNK, 128)
        src = x_ref[0:2, pl.ds(ws, SLAB)]  # (2, SLAB) dynamic lane slice
        # one-hot built from a dynamically sliced i32 ref read
        dr = d_ref[0:1, pl.ds(cs, BCHUNK)]  # (1, BCHUNK)
        off = cs - ws
        jjm = jax.lax.broadcasted_iota(jnp.int32, (SLAB, BCHUNK), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (1, BCHUNK), 1)
        oh = (jjm == li + off + dr).astype(jnp.bfloat16)  # (SLAB, BCHUNK)
        mm = jnp.dot(src.astype(jnp.bfloat16), oh, preferred_element_type=jnp.float32)
        out_ref[0:2, pl.ds(cs, BCHUNK)] = out_ref[0:2, pl.ds(cs, BCHUNK)] + mm
        g3[0, 1, pl.ds(cs, BCHUNK)] = mm[0:1, :].reshape(1, BCHUNK)[0]
        return 0

    jax.lax.fori_loop(0, NC, body, 0)
    out_ref[0:1, 0:128] = out_ref[0:1, 0:128] + g3[0:1, 1, 0:128]


@jax.jit
def run(x, d):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 4, B), jnp.float32)],
    )(x, d)


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, B)).astype(np.float32))
    d = jnp.asarray(np.random.default_rng(1).integers(1, BAND, size=(1, B)).astype(np.int32))
    out = np.asarray(run(x, d))
    # oracle
    xn = np.asarray(x)
    dn = np.asarray(d)
    want = np.zeros((2, B), np.float32)
    for c in range(NC):
        ws = max(0, min(c * BCHUNK, B - SLAB))
        off = c * BCHUNK - ws
        src = xn[:, ws : ws + SLAB].astype(np.float32)
        oh = np.zeros((SLAB, BCHUNK), np.float32)
        for j in range(BCHUNK):
            tgt = off + j + dn[0, c * BCHUNK + j]
            if 0 <= tgt < SLAB:
                oh[tgt, j] = 1.0
        want[:, c * BCHUNK : (c + 1) * BCHUNK] += (
            src.astype(np.float32) @ oh
        )
    want[0, 0:128] += want[0, 0:128]  # g3 echo adds mm row 0 again on chunk 0... no
    # recompute the g3 echo exactly: g3[0,1,cs] held the LAST write per chunk;
    # out[0, 0:128] += g3 row of chunk 0
    ws0 = 0
    oh0 = np.zeros((SLAB, BCHUNK), np.float32)
    for j in range(BCHUNK):
        tgt = j + dn[0, j]
        if 0 <= tgt < SLAB:
            oh0[tgt, j] = 1.0
    g3row = xn[:, 0:SLAB] @ oh0
    want2 = want.copy()
    want2[0, 0:128] = want[0, 0:128] - want[0, 0:128]  # placeholder
    # simpler: just compare to kernel output recomputed directly
    base = np.zeros((2, B), np.float32)
    for c in range(NC):
        ws = max(0, min(c * BCHUNK, B - SLAB))
        off = c * BCHUNK - ws
        src = xn[:, ws : ws + SLAB]
        oh = np.zeros((SLAB, BCHUNK), np.float32)
        for j in range(BCHUNK):
            tgt = off + j + dn[0, c * BCHUNK + j]
            if 0 <= tgt < SLAB:
                oh[tgt, j] = 1.0
        hi = src.astype(np.float32)
        base[:, c * BCHUNK : (c + 1) * BCHUNK] = hi @ oh
    base[0, 0:128] += base[0, 0:128] * 0 + (xn[:, 0:SLAB] @ oh0)[0]
    err = np.abs(out - base).max() / max(np.abs(base).max(), 1e-9)
    print("max rel err vs oracle:", err)
    assert err < 2e-2, err
    print("PROBE OK: dynamic lane slices + on-the-fly one-hot matmul in fori_loop work")


if __name__ == "__main__":
    main()
