"""Reproduce / budget the sponza-caps G-buffer raster VMEM failure (round 4).

Compiles rasterize_gbuffer_pallas at the sponza bench capacities (vm=2048,
R=64, 1080p) and prints either success + timing or the full RESOURCE_EXHAUSTED
breakdown. Run on the TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from oxylus_tpu.ops.raster3d import (  # noqa: E402
    pack_gbuffer_coeff_matrix,
    rasterize_gbuffer_pallas,
)

VM = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
W, H = 1920, 1080
R = 64

rng = np.random.default_rng(0)
coeffs = jnp.asarray(rng.normal(size=(VM, R, 6, 3)).astype(np.float32))
attr_planes = jnp.asarray(rng.normal(size=(VM, R, 16, 3)).astype(np.float32))
tri_valid = jnp.ones((VM, R), bool)
mat_consts = jnp.asarray(rng.uniform(size=(VM, 8)).astype(np.float32))

cm6, attrB = pack_gbuffer_coeff_matrix(coeffs[..., :5, :], attr_planes, tri_valid, mat_consts)
print("cm6", cm6.shape, cm6.dtype, "attrB", attrB.shape, attrB.dtype)

tx, ty = (W + 63) // 64, (H + 63) // 64
n_tiles = tx * ty
K = 64
tl = np.full((n_tiles, K), -1, np.int32)
# ~4 hits per tile to exercise the loop
for t in range(n_tiles):
    tl[t, :4] = rng.integers(0, VM, 4)
tile_list = jnp.asarray(tl)
ml_near = jnp.asarray(rng.uniform(0.1, 1.0, size=(VM,)).astype(np.float32))

try:
    d, v, gb = rasterize_gbuffer_pallas(cm6, attrB, tile_list, W, H, ml_near=ml_near)
    jax.block_until_ready((d, v, gb))
    t0 = time.perf_counter()
    for _ in range(10):
        d, v, gb = rasterize_gbuffer_pallas(cm6, attrB, tile_list, W, H, ml_near=ml_near)
    jax.block_until_ready((d, v, gb))
    dt = (time.perf_counter() - t0) / 10
    print(f"OK vm={VM}: {dt*1e3:.2f} ms/raster")
except Exception as e:  # noqa: BLE001
    print(f"FAILED vm={VM}:")
    print(str(e)[:8000])
