"""Bloom/resample strategy shootout at 1080p on TPU."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920
img = jnp.asarray(np.random.rand(H, W, 3).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[len(ts)//2]*1e3:7.2f} ms")
    return r


# current strided downsample
def down_strided(x):
    h, w = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
    x = x[:h, :w]
    return (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2]) * 0.25


def down_reduce_window(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID") * 0.25


def down_reshape(x):
    h, w = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
    return x[:h, :w].reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))


def up_repeat(x, th, tw):
    up = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return up[:th, :tw]


def up_resize(x, th, tw):
    return jax.image.resize(x, (th, tw, 3), method="nearest")


def up_broadcast(x, th, tw):
    h, w, c = x.shape
    up = jnp.broadcast_to(x[:, None, :, None, :], (h, 2, w, 2, c)).reshape(h * 2, w * 2, c)
    return up[:th, :tw]


def chain(down, up, x, mips=5):
    c = [down(x)]
    for _ in range(mips - 1):
        if min(c[-1].shape[:2]) < 4:
            break
        c.append(down(c[-1]))
    acc = c[-1]
    for i in range(len(c) - 2, -1, -1):
        acc = c[i] + up(acc, *c[i].shape[:2])
    return x + up(acc, x.shape[0], x.shape[1])


timeit("down strided 1080p", down_strided, img)
timeit("down reduce_window", down_reduce_window, img)
timeit("down reshape-mean", down_reshape, img)
half = down_strided(img)
timeit("up repeat (half->full)", lambda x: up_repeat(x, H, W), half)
timeit("up resize-nearest", lambda x: up_resize(x, H, W), half)
timeit("up broadcast", lambda x: up_broadcast(x, H, W), half)
timeit("CHAIN strided+repeat", lambda x: chain(down_strided, up_repeat, x), img)
timeit("CHAIN rw+broadcast", lambda x: chain(down_reduce_window, up_broadcast, x), img)
timeit("CHAIN reshape+resize", lambda x: chain(down_reshape, up_resize, x), img)
# planar layout variant
imgp = jnp.moveaxis(img, -1, 0)  # (3, H, W)


def down_p(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    x = x[:, :h, :w]
    return (x[:, 0::2, 0::2] + x[:, 1::2, 0::2] + x[:, 0::2, 1::2] + x[:, 1::2, 1::2]) * 0.25


def up_p(x, th, tw):
    h, w = x.shape[1], x.shape[2]
    up = jnp.broadcast_to(x[:, :, None, :, None], (3, h, 2, w, 2)).reshape(3, h * 2, w * 2)
    return up[:, :th, :tw]


def chain_p(x):
    c = [down_p(x)]
    for _ in range(4):
        if min(c[-1].shape[1:]) < 4:
            break
        c.append(down_p(c[-1]))
    acc = c[-1]
    for i in range(len(c) - 2, -1, -1):
        acc = c[i] + up_p(acc, *c[i].shape[1:])
    return x + up_p(acc, x.shape[1], x.shape[2])


timeit("CHAIN planar strided+bcast", chain_p, imgp)
