"""Time individual post passes in isolation at 1080p on TPU."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920
rng = np.random.default_rng(0)
hdr = jnp.asarray(rng.random((H, W, 3), np.float32) * 2)
depth = jnp.asarray(rng.random((H, W), np.float32))
wpos = jnp.asarray(rng.random((H, W, 3), np.float32) * 20)
nrm_ = rng.random((H, W, 3), np.float32) - 0.5
nrm = jnp.asarray(nrm_ / np.linalg.norm(nrm_, axis=-1, keepdims=True))
hit = jnp.ones((H, W), bool)
vp = jnp.eye(4)
cam = jnp.zeros(3)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[len(ts)//2]*1e3:7.2f} ms")


from oxylus_tpu.render.postfx import apply_bloom, apply_fxaa, apply_tonemap, luminance_histogram
from oxylus_tpu.render.gtao import gtao, denoise_ao
from oxylus_tpu.render.shadows import contact_shadows, resolve_shadows
from oxylus_tpu.render.pbr import Lights, apply_pbr

timeit("bloom 1080p", apply_bloom, hdr)
timeit("fxaa 1080p", apply_fxaa, hdr)
timeit("tonemap 1080p", lambda x: apply_tonemap(x, tonemapper=0, exposure=1.0, gamma=2.2, frame=jnp.int32(0)), hdr)
timeit("histogram 1080p", lambda x: luminance_histogram(x, jnp.float32(-11.5), jnp.float32(1 / 29.5)), hdr)
timeit("gtao HALF-res", lambda p, n, ht: gtao(p[::2, ::2], n[::2, ::2], ht[::2, ::2], frame=jnp.int32(0)), wpos, nrm, hit)
timeit("gtao FULL-res", lambda p, n, ht: gtao(p, n, ht, frame=jnp.int32(0)), wpos, nrm, hit)
timeit("denoise full", denoise_ao, jnp.ones((H, W)), depth)
timeit("contact q-res 8 steps", lambda d, p, ht: contact_shadows(d[::4, ::4], p[::4, ::4], ht[::4, ::4], jnp.array([0., -1., 0.]), vp), depth, wpos, hit)
sm = jnp.asarray(rng.random((4, 1024, 1024), np.float32))
vps = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
timeit("resolve_shadows HALF", lambda p, ht: resolve_shadows(p[::2, ::2], ht[::2, ::2], vps, sm), wpos, hit)
