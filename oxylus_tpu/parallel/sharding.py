"""Multi-chip scaling: worlds-data-parallelism + screen-tile sharding.

The reference is a single-GPU engine (SURVEY §2.8); its scale story is job threads +
indirect dispatch. The TPU-native scale story is `jax.sharding` over a device Mesh:

- **Worlds axis (dp analog)**: N independent scenes vmapped and sharded one-per-device —
  the simulation-farm deployment (RL envs, server-side game rooms). Collectives only
  for cross-world reductions (stats, replication digests) via `psum`.
- **Tile axis (sp analog)**: a single frame's rasterization sharded by screen-tile
  rows — each device rasterizes its slice of the tile list against the (replicated)
  visible-geometry buffers; the framebuffer is produced already-sharded, no gather
  needed until readback.

Both compile and run on a virtual CPU mesh (tests) and on real ICI meshes unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "worlds") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(axis,))


# ---------------------------------------------------------------------------
# Worlds parallelism
# ---------------------------------------------------------------------------

def replicate_worlds(tree, n_worlds: int, mesh: Mesh):
    """Stack `n_worlds` copies of a pytree along a leading axis sharded over the mesh."""
    shard = NamedSharding(mesh, P("worlds"))
    stack = lambda x: jnp.broadcast_to(x[None], (n_worlds,) + x.shape)
    batched = jax.tree.map(stack, tree)
    return jax.tree.map(lambda x: jax.device_put(x, shard), batched)


def worlds_step(step_fn):
    """Lift a per-world step to the sharded worlds batch (vmap; sharding propagates)."""
    return jax.jit(jax.vmap(step_fn))


def worlds_reduce_mean(values):
    """Cross-world mean (one `psum`-backed collective over the worlds axis)."""
    return jnp.mean(values, axis=0)


# ---------------------------------------------------------------------------
# Tile-sharded rasterization
# ---------------------------------------------------------------------------

def rasterize_tiles_sharded(
    coeff_mat,      # (VM, 3, 5R) — replicated
    tile_list,      # (T, K) — sharded over tiles
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "worlds",
):
    """Shard the visbuffer raster across the mesh by tile rows.

    Pads the tile count to a multiple of the axis size, runs the per-tile scan on each
    device's shard of the list, and returns full-resolution depth/id buffers (sharded
    by construction; `device_get` assembles them)."""
    from ..ops.raster3d import PIX, TILE, rasterize_reference

    n_dev = mesh.shape[axis]
    t = tile_list.shape[0]
    pad = (-t) % n_dev
    if pad:
        tile_list = jnp.concatenate(
            [tile_list, jnp.full((pad, tile_list.shape[1]), -1, tile_list.dtype)]
        )

    tx = (width + TILE - 1) // TILE

    def shard_fn(coeffs, tiles_shard, shard_idx):
        # rasterize this shard's tiles at their true screen positions by operating on
        # the flat (tiles, PIX) layout of the reference kernel
        k_cap = tiles_shard.shape[1]
        n_tiles_local = tiles_shard.shape[0]
        base = shard_idx[0] * n_tiles_local
        tile_ids = jnp.arange(n_tiles_local, dtype=jnp.int32) + base
        x0 = (tile_ids % tx) * TILE
        y0 = (tile_ids // tx) * TILE
        lin = jnp.arange(PIX, dtype=jnp.int32)
        px = (x0[:, None] + (lin % TILE)[None, :]).astype(jnp.float32) + 0.5
        py = (y0[:, None] + (lin // TILE)[None, :]).astype(jnp.float32) + 0.5
        pmat = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)

        def step(carry, k):
            depth, vid = carry
            vm = tiles_shard[:, k]
            live = vm >= 0
            cm = coeffs[jnp.maximum(vm, 0)]
            r = cm.shape[-1] // 5  # homogeneous planes: e0 e1 e2 | zn wd
            e = jnp.einsum("tpc,tcq->tpq", pmat, cm)
            e0, e1, e2 = e[..., :r], e[..., r : 2 * r], e[..., 2 * r : 3 * r]
            zn, wd = e[..., 3 * r : 4 * r], e[..., 4 * r :]
            cover = (
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                & (wd > 0) & (zn >= 0) & (zn <= wd)
                & live[:, None, None]
            )
            z = zn / jnp.where(wd > 0, wd, 1.0)
            zm = jnp.where(cover, z, -1.0)
            best = jnp.max(zm, axis=-1)
            arg = jnp.argmax(zm, axis=-1).astype(jnp.int32)
            better = best > depth
            pid = (vm[:, None] << 8) | arg
            return (jnp.where(better, best, depth), jnp.where(better, pid, vid)), ()

        # carry must be marked device-varying over the mesh axis (shard_map vma rules)
        depth0 = jax.lax.pcast(jnp.zeros((n_tiles_local, PIX), jnp.float32), axis, to="varying")
        vid0 = jax.lax.pcast(jnp.full((n_tiles_local, PIX), -1, jnp.int32), axis, to="varying")
        (depth, vid), _ = jax.lax.scan(step, (depth0, vid0), jnp.arange(k_cap))
        return depth, vid

    shard_ids = jnp.arange(n_dev, dtype=jnp.int32)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    depth, vid = jax.jit(fn)(coeff_mat, tile_list, shard_ids)

    # untile to (H, W)
    ty = (height + TILE - 1) // TILE
    n_tiles = tx * ty

    def untile(a):
        a = a[:n_tiles].reshape(ty, tx, TILE, TILE)
        return a.transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)[:height, :width]

    return untile(depth), untile(vid)
