"""Check timing methodology + isolate transcendental costs."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920
rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.random((H, W, 3), np.float32) * 2) for _ in range(6)]
img = imgs[0]


def timeit_same(name, fn):
    f = jax.jit(fn)
    r = f(img); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(6):
        r = f(img)
    jax.block_until_ready(r)
    print(f"{name} (same input): {(time.perf_counter()-t0)/6*1e3:7.2f} ms")


def timeit_diff(name, fn):
    f = jax.jit(fn)
    r = f(imgs[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(6):
        r = f(imgs[i])
    jax.block_until_ready(r)
    print(f"{name} (diff input): {(time.perf_counter()-t0)/6*1e3:7.2f} ms")


from oxylus_tpu.render.postfx import apply_bloom, apply_fxaa

timeit_same("bloom", apply_bloom)
timeit_diff("bloom", apply_bloom)
timeit_same("fxaa", apply_fxaa)
timeit_diff("fxaa", apply_fxaa)
timeit_diff("mul2", lambda x: x * 2.0)
timeit_diff("pow 1/2.2", lambda x: jnp.power(jnp.maximum(x, 1e-6), 1.0 / 2.2))
timeit_diff("sqrt", jnp.sqrt)
timeit_diff("exp2log2", lambda x: jnp.exp2(jnp.log2(jnp.maximum(x, 1e-6)) * (1 / 2.2)))
timeit_diff("x^7/16 sqrt-chain", lambda x: jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.maximum(x, 1e-6) ** 7))))
timeit_diff("exp", jnp.exp)
timeit_diff("arccos(clip)", lambda x: jnp.arccos(jnp.clip(x[..., 0] - 1.0, -1.0, 1.0)))
timeit_diff("16 shifts sum", lambda x: sum(
    jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
    for dy in (-1, 0, 1) for dx in (-1, 0, 1)
))
