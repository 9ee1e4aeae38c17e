"""Probe dynamic roll, SMEM scalar loops, argmax-extraction, and VPU/MXU rates."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kern, inputs, out_shape, scratch=(), reps=20, inner=1):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=list(scratch),
        )
        jf = jax.jit(f)
        r = jf(*inputs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*inputs)
        jax.block_until_ready(r)
        el = (time.perf_counter() - t0) / reps
        print(f"OK   {name}: {el*1e6:9.1f} us  ({el*1e9/inner:8.1f} ns/inner)  val={np.asarray(r).ravel()[:3]}")
        return el
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0][:160]}")
        return None


S, L = 8, 128
x = (jnp.arange(S * L, dtype=jnp.float32).reshape(S, L) % 13.0) + 1.0

# --- 1. dynamic roll: shift from SMEM scalar ---------------------------------
def k_dynroll(xr, o, smem):
    smem[0] = 5

    def body(i, c):
        sh = smem[0]
        o[:] = pltpu.roll(xr[:], shift=sh, axis=1)
        return c

    jax.lax.fori_loop(0, 1, body, 0)

run("dynamic roll (SMEM shift)", k_dynroll, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32), scratch=[pltpu.SMEM((4,), jnp.int32)])

# --- 2. static roll chain rate ------------------------------------------------
N_INNER = 2000
def k_rollrate(xr, o):
    def body(i, acc):
        return acc + pltpu.roll(xr[:], shift=1, axis=1)
    o[:] = jax.lax.fori_loop(0, N_INNER, body, jnp.zeros_like(xr[:]))

run("static roll x2000 (8,128)", k_rollrate, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32), inner=N_INNER)

# --- 2b. dynamic roll chain rate ----------------------------------------------
def k_dynrollrate(xr, o, smem):
    smem[0] = 3
    def body(i, acc):
        return acc + pltpu.roll(xr[:], shift=smem[0] + i % 4, axis=1)
    o[:] = jax.lax.fori_loop(0, N_INNER, body, jnp.zeros_like(xr[:]))

run("dynamic roll x2000 (8,128)", k_dynrollrate, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32),
    scratch=[pltpu.SMEM((4,), jnp.int32)], inner=N_INNER)

# --- 3. VPU f32 rate: fused mul-add chain on (8,128) --------------------------
def k_vpu(xr, o):
    def body(i, acc):
        a = acc * 1.000001 + xr[:]
        b = a * a - xr[:]
        c = b * 0.5 + a
        d = c * c + b
        return d
    o[:] = jax.lax.fori_loop(0, N_INNER, body, xr[:])

run("VPU chain x2000x8flop (8,128)", k_vpu, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32), inner=N_INNER * 8)

# --- 3b. VPU f32 rate on (128, 384) -------------------------------------------
xb = (jnp.arange(128 * 384, dtype=jnp.float32).reshape(128, 384) % 13.0) + 1.0
def k_vpu_big(xr, o):
    def body(i, acc):
        a = acc * 1.000001 + xr[:]
        b = a * a - xr[:]
        c = b * 0.5 + a
        d = c * c + b
        return d
    o[:] = jax.lax.fori_loop(0, 200, body, xr[:])

run("VPU chain x200x8flop (128,384)", k_vpu_big, [xb],
    jax.ShapeDtypeStruct((128, 384), jnp.float32), inner=200 * 8 * 48)

# --- 4. MXU rates --------------------------------------------------------------
for (m, k, n, dt) in [(128, 384, 16, jnp.float32), (128, 384, 128, jnp.float32),
                      (128, 384, 16, jnp.bfloat16), (1024, 1024, 128, jnp.bfloat16),
                      (1024, 1024, 128, jnp.float32)]:
    a = jnp.ones((m, k), dt)
    bmat = jnp.ones((k, n), dt)
    REPS_M = 500
    def k_mxu(ar, br, o):
        def body(i, acc):
            return acc + jnp.dot(ar[:], br[:], preferred_element_type=jnp.float32)
        o[:] = jax.lax.fori_loop(0, REPS_M, body, jnp.zeros((m, n), jnp.float32))
    el = run(f"MXU {m}x{k}x{n} {dt.__name__} x500", k_mxu, [a, bmat],
             jax.ShapeDtypeStruct((m, n), jnp.float32), inner=REPS_M)
    if el:
        print(f"     -> {2*m*k*n*REPS_M/el/1e12:.2f} TFLOP/s")

# --- 5. argmax extraction loop: K rounds of argmax+onehot+mask -----------------
mask0 = (x % 3.0) < 1.0
def k_extract(xr, o):
    m = (xr[:] % 3.0) < 1.0
    score = jnp.where(m, xr[:], -1.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    out = jnp.zeros((S, L), jnp.float32)
    def body(k, carry):
        score, out = carry
        idx = jnp.argmax(score, axis=1, keepdims=True)
        onehot = (lane == idx).astype(jnp.float32)
        out = out + onehot * (1.0 + k)
        score = jnp.where(onehot > 0, -1.0, score)
        return score, out
    score, out = jax.lax.fori_loop(0, 16, body, (score, out))
    o[:] = out

run("argmax-extract 16 rounds (8,128)", k_extract, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32))

# --- 6. fori_loop with dynamic trip count from SMEM ----------------------------
def k_dyntrip(xr, o, smem):
    smem[0] = 37
    def body(i, acc):
        return acc + xr[:]
    o[:] = jax.lax.fori_loop(0, smem[0], body, jnp.zeros_like(xr[:]))

run("dynamic trip fori (37 iters)", k_dyntrip, [x],
    jax.ShapeDtypeStruct((S, L), jnp.float32), scratch=[pltpu.SMEM((4,), jnp.int32)])
