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


# ---------------------------------------------------------------------------
# Full-frame band sharding: raster → decode → PBR → exposure → tonemap → FXAA
# ---------------------------------------------------------------------------

def render_frame_sharded(
    setup,            # from setup_triangles (replicated): clip/packed_verts/coeffs…
    coeff_mat,        # (VM, 3, 5R) from pack_coeff_matrix — replicated
    tile_list,        # (T, K) vm slot or -1 — sharded by tile rows
    vm_instance,      # (VM,) — replicated
    gscene,           # GPUScene — replicated
    entity_world,     # (E, 4, 4) — replicated
    materials,        # GPUMaterials — replicated
    atlas,            # texture atlas — replicated
    lights,           # Lights — replicated
    camera_pos,       # (3,)
    ambient_color,    # (3,) or (9, 3) SH
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "worlds",
    *,
    prev_luminance=1.0,
    dt=1.0 / 60.0,
    tonemapper: int = 1,
):
    """The full 3D frame core sharded over the mesh by screen-tile row bands.

    Widens `rasterize_tiles_sharded` (raster only) to the whole per-pixel frame:
    each device rasterizes, decodes, and lights its horizontal band; eye adaptation
    becomes a cross-band `psum` of the luminance histogram (every device then applies
    the identical global exposure); FXAA exchanges one-row halos over `ppermute` so
    band seams filter exactly like the single-device frame. Geometry prep (cull/
    setup/binning — proportional to scene size, not resolution) stays replicated:
    per "How to Scale Your Model", shard the axis the cost scales with (pixels).

    Returns (ldr (H, W, 3) assembled, new_adapted_luminance). Bit-exact vs the
    single-device pipeline when height is a multiple of n_dev*TILE
    (tests/test_sharding.py); otherwise the final band's FXAA edge rows filter
    against padded (cropped) rows instead of edge replication.
    """
    from ..ops.decode3d import decode_visbuffer
    from ..ops.raster3d import PIX, TILE
    from ..render.pbr import apply_pbr
    from ..render.postfx import (
        adapt_exposure,
        apply_fxaa,
        apply_tonemap,
        luminance_histogram,
    )

    n_dev = mesh.shape[axis]
    tx = (width + TILE - 1) // TILE
    ty = (height + TILE - 1) // TILE
    ty_pad = ((ty + n_dev - 1) // n_dev) * n_dev
    rows_local = ty_pad // n_dev
    bh = rows_local * TILE
    n_tiles = tx * ty
    k_cap = tile_list.shape[1]
    if ty_pad * tx != tile_list.shape[0]:
        tile_list = jnp.concatenate(
            [
                tile_list[:n_tiles],
                jnp.full((ty_pad * tx - n_tiles, k_cap), -1, tile_list.dtype),
            ]
        )

    slots_per_tri = setup["slots_per_tri"]
    clip = setup["clip"]
    packed_verts = setup["packed_verts"]
    prev_lum = jnp.asarray(prev_luminance, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)

    def shard_fn(cm, tiles, clip, pv, vm_inst, gsc, eworld, mats, atl, lts, cpos, amb, plum, dtv):
        idx = jax.lax.axis_index(axis)
        n_local = tiles.shape[0]

        # -- raster this band's tiles at their true screen positions ----------
        base = idx * n_local
        tids = jnp.arange(n_local, dtype=jnp.int32) + base
        x0 = (tids % tx) * TILE
        y0 = (tids // tx) * TILE
        lin = jnp.arange(PIX, dtype=jnp.int32)
        px = (x0[:, None] + (lin % TILE)[None, :]).astype(jnp.float32) + 0.5
        py = (y0[:, None] + (lin // TILE)[None, :]).astype(jnp.float32) + 0.5
        pmat = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)

        def step(carry, k):
            depth, vid = carry
            vm = tiles[:, k]
            live = vm >= 0
            cmk = cm[jnp.maximum(vm, 0)]
            r = cmk.shape[-1] // 5
            e = jnp.einsum("tpc,tcq->tpq", pmat, cmk)
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

        depth0 = jax.lax.pcast(jnp.zeros((n_local, PIX), jnp.float32), axis, to="varying")
        vid0 = jax.lax.pcast(jnp.full((n_local, PIX), -1, jnp.int32), axis, to="varying")
        (_, vid), _ = jax.lax.scan(step, (depth0, vid0), jnp.arange(k_cap))

        # untile this band: (rows_local, tx, TILE, TILE) → (bh, W)
        vid_band = (
            vid.reshape(rows_local, tx, TILE, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(bh, tx * TILE)[:, :width]
        )

        # -- decode + light + post (per-pixel; global row offset for NDC) -----
        gbuf = decode_visbuffer(
            vid_band,
            {"clip": clip, "packed_verts": pv, "slots_per_tri": slots_per_tri},
            vm_inst, gsc, eworld, mats, atl,
            width=width, height=bh,
            # NDC row mapping uses the TRUE framebuffer height; rows past it
            # (tile-row padding up to n_dev) decode garbage and are cropped below
            row_offset=(idx * bh).astype(jnp.float32), full_height=height,
        )
        hdr = apply_pbr(gbuf, lts, cpos, amb)

        # eye adaptation: band histogram → global psum → identical exposure
        hist = luminance_histogram(hdr, jnp.float32(-11.5), jnp.float32(1.0 / 29.5))
        hist = jax.lax.psum(hist, axis)
        exposure, new_lum = adapt_exposure(hist, plum, dtv)
        ldr = apply_tonemap(hdr, tonemapper, exposure)

        # FXAA over one-row ppermute halos: seam rows see true neighbors
        fwd = [(i, i + 1) for i in range(n_dev - 1)]
        bwd = [(i + 1, i) for i in range(n_dev - 1)]
        from_above = jax.lax.ppermute(ldr[-1:], axis, perm=fwd)
        from_below = jax.lax.ppermute(ldr[:1], axis, perm=bwd)
        top = jnp.where(idx == 0, ldr[:1], from_above)
        bot = jnp.where(idx == n_dev - 1, ldr[-1:], from_below)
        padded = jnp.concatenate([top, ldr, bot], axis=0)
        out = apply_fxaa(padded)[1:-1]
        return out, new_lum

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis, None, None), P()),
    )
    ldr, new_lum = jax.jit(fn)(
        coeff_mat, tile_list, clip, packed_verts, vm_instance, gscene,
        entity_world, materials, atlas, lights, camera_pos,
        jnp.asarray(ambient_color, jnp.float32), prev_lum, dt,
    )
    return ldr[:height], new_lum
