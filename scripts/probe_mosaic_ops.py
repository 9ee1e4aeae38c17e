"""Probe which ops Mosaic supports in-kernel on this jax/libtpu build."""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kern, inputs, out_shape):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        r = jax.jit(f)(*inputs)
        jax.block_until_ready(r)
        print(f"OK   {name}  -> {np.asarray(r).ravel()[:4]}")
        return r
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {msg}")
        return None


B, C = 128, 384
x = jnp.arange(B * C, dtype=jnp.float32).reshape(B, C) % 7.0
idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[::-1], (B, C))
idx_small = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[::-1], (B, 128))

# 1. take_along_axis along lanes, same width
try_kernel(
    "take_along_axis axis=1 (384->384)",
    lambda xr, ir, o: o.__setitem__(slice(None), jnp.take_along_axis(xr[:], ir[:], axis=1)),
    [x, idx],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 2. take_along_axis along lanes, narrower output (384 -> 128)
idx_n = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32) * 3, (B, 128))
try_kernel(
    "take_along_axis axis=1 (384->128)",
    lambda xr, ir, o: o.__setitem__(slice(None), jnp.take_along_axis(xr[:], ir[:], axis=1)),
    [x, idx_n],
    jax.ShapeDtypeStruct((B, 128), jnp.float32),
)

# 3. cumsum along lanes
try_kernel(
    "cumsum axis=1",
    lambda xr, o: o.__setitem__(slice(None), jnp.cumsum(xr[:], axis=1)),
    [x],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 4. cumsum along sublanes
try_kernel(
    "cumsum axis=0",
    lambda xr, o: o.__setitem__(slice(None), jnp.cumsum(xr[:], axis=0)),
    [x],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 5. sort along lanes
try_kernel(
    "sort axis=1",
    lambda xr, o: o.__setitem__(slice(None), jnp.sort(xr[:], axis=1)),
    [x],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 6. argmax along lanes
try_kernel(
    "argmax axis=1 keepdims",
    lambda xr, o: o.__setitem__(slice(None), jnp.argmax(xr[:], axis=1, keepdims=True).astype(jnp.float32)),
    [x],
    jax.ShapeDtypeStruct((B, 1), jnp.float32),
)

# 7. pltpu.roll along lanes
try_kernel(
    "pltpu.roll axis=1",
    lambda xr, o: o.__setitem__(slice(None), pltpu.roll(xr[:], shift=5, axis=1)),
    [x],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 8. gather rows: x[idx_rows, :] via take along axis 0
idx_r = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[::-1, None], (B, C))
try_kernel(
    "take_along_axis axis=0",
    lambda xr, ir, o: o.__setitem__(slice(None), jnp.take_along_axis(xr[:], ir[:], axis=0)),
    [x, idx_r],
    jax.ShapeDtypeStruct((B, C), jnp.float32),
)

# 9. bf16 arithmetic
xb = x.astype(jnp.bfloat16)
try_kernel(
    "bf16 mul+add",
    lambda xr, o: o.__setitem__(slice(None), xr[:] * xr[:] + xr[:]),
    [xb],
    jax.ShapeDtypeStruct((B, C), jnp.bfloat16),
)

# 10. dynamic gather from a (1, N) ref row with int vector: x1[0, idx]
x1 = jnp.arange(1024, dtype=jnp.float32).reshape(1, 1024)
ii = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32) * 7) % 1024, (1, 128))
try_kernel(
    "gather (1,1024)->(1,128) take_along_axis",
    lambda xr, ir, o: o.__setitem__(slice(None), jnp.take_along_axis(xr[:], ir[:], axis=1)),
    [x1, ii],
    jax.ShapeDtypeStruct((1, 128), jnp.float32),
)
