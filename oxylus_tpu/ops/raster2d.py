"""Tiled 2D sprite rasterizer.

TPU-first re-design of the reference 2D forward pass (`/root/reference/Oxylus/src/Render/
RendererInstance.cpp:945-1088`, shader `Shaders/passes/2d_forward.slang:29-80`): instead
of instanced hardware quads with CPU-side sorting + alpha blending in ROPs, sprites are

  1. key-sorted on device (u64 {depth:32|y:32} keys, the reference's sort-key scheme
     at `SceneGPU.hpp:353-456`, built with the float→sortable-u32 bit trick),
  2. binned to screen tiles with a fixed per-tile capacity (cumsum compaction — the
     indirect-draw replacement, SURVEY §2.8),
  3. composited per tile in sorted order by a `lax.scan` over the tile's sprite list —
     the serialized ordered-blend that ROPs do in hardware, here done in VMEM-sized
     tile blocks that XLA keeps resident.

Also emits a sprite-id visbuffer (the `2d_forward_vis` picking target, i32 entity id per
pixel). Everything is fixed-shape; overflowing a tile's capacity drops the *farthest*
sprites (they would be overdrawn anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import math3d
from .sampling import f32_to_sortable_u32, sample_atlas_bilinear

Array = jax.Array

TILE = 32  # pixels per tile side


def sprite_sort_order(depth: Array, y_world: Array, sort_y: Array, layer: Array, valid: Array) -> Array:
    """Back-to-front draw order via a multi-key lexicographic device sort
    (`jax.lax.sort` with num_keys — the u64-key sort of `SceneGPU.hpp:353-456`,
    expressed as (invalid, layer, depth, -y) u32 key columns; 32-bit clean for TPU).
    Lower layers first, then far-to-near, then higher y first (so lower sprites draw
    later = in front, the 2D convention)."""
    s = depth.shape[0]
    zkey = f32_to_sortable_u32(depth)
    ykey = f32_to_sortable_u32(jnp.where(sort_y, -y_world, jnp.zeros_like(y_world)))
    primary = jnp.where(valid, layer.astype(jnp.int32), jnp.int32(2**31 - 1))
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)[:, 0]
    _, _, _, order = jax.lax.sort((primary, zkey, ykey, idx), num_keys=3)
    return order


@partial(jax.jit, static_argnames=("width", "height", "k_per_tile", "use_pallas"))
def rasterize_sprites(
    world: Array,        # (S, 4, 4) sprite world matrices (unit quad in XY plane)
    material_idx: Array, # (S,) i32 index into GPUMaterials arrays
    entity_id: Array,    # (S,) i32 for the picking visbuffer
    layer: Array,        # (S,) i32
    sort_y: Array,       # (S,) bool
    flip_x: Array,       # (S,) bool
    valid: Array,        # (S,) bool
    view_proj: Array,    # (4, 4)
    materials,           # GPUMaterials
    atlas: Array,        # (A, A, 4) uint8
    *,
    width: int,
    height: int,
    k_per_tile: int = 64,
    use_pallas: bool | None = None,
    scene_depth: Array | None = None,
) -> tuple[Array, Array]:
    """Returns (color (H, W, 4) f32 premultiplied-over result, visbuffer (H, W) i32).

    `scene_depth` (H, W) f32 reverse-Z: when given, each sprite/billboard is
    depth-TESTED (no write) against it — pixels where the record's NDC z is not
    strictly nearer are dropped before blending. This is the Forward2D-over-3D
    analog of the reference's alpha pass drawing into the scene depth buffer
    with GreaterOrEqual test + write-off (`RendererInstance.cpp:945-1088`)."""
    s = world.shape[0]
    tx = (width + TILE - 1) // TILE
    ty = (height + TILE - 1) // TILE
    n_tiles = tx * ty

    # --- project quad corners ------------------------------------------------
    corners_local = jnp.array(
        [[-0.5, -0.5, 0.0, 1.0], [0.5, -0.5, 0.0, 1.0], [-0.5, 0.5, 0.0, 1.0], [0.5, 0.5, 0.0, 1.0]],
        jnp.float32,
    )  # (4, 4)
    mvp = jnp.einsum("ij,sjk->sik", view_proj, world)  # (S,4,4)
    clip = jnp.einsum("sik,ck->sci", mvp, corners_local)  # (S,4corners,4)
    w_clip = jnp.maximum(jnp.abs(clip[..., 3]), 1e-6) * jnp.sign(jnp.where(clip[..., 3] == 0, 1.0, clip[..., 3]))
    ndc = clip[..., :3] / w_clip[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    depth = jnp.mean(ndc[..., 2], axis=-1)  # (S,)

    xmin = jnp.min(sx, axis=-1)
    xmax = jnp.max(sx, axis=-1)
    ymin = jnp.min(sy, axis=-1)
    ymax = jnp.max(sy, axis=-1)
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height) & valid

    # --- sort ---------------------------------------------------------------
    y_world = world[:, 1, 3]
    order = sprite_sort_order(depth, y_world, sort_y, layer, on_screen)

    # --- fast path: Pallas tile kernel (TPU) ---------------------------------
    platform = jax.devices()[0].platform
    if use_pallas is None:
        use_pallas = platform in ("tpu", "axon")
    if use_pallas:
        from .raster2d_pallas import MAX_VISIBLE, blend_tiles_pallas, resample_texture_tiles

        # Gathers are the expensive primitive on this target (PERF_NOTES.md):
        # everything needed post-sort is packed into ONE matrix so sorting costs a
        # single row gather instead of ~25 per-field gathers.
        m = materials  # fields are (S,) — pre-resolved per sprite by the caller
        p00x, p00y = sx[:, 0], sy[:, 0]
        e0x, e0y = sx[:, 1] - sx[:, 0], sy[:, 1] - sy[:, 0]
        e1x, e1y = sx[:, 2] - sx[:, 0], sy[:, 2] - sy[:, 0]
        det = e0x * e1y - e0y * e1x
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        packed = jnp.stack(
            [
                p00x, p00y, e0x, e0y, e1x, e1y, inv_det,
                m.albedo_color[:, 0], m.albedo_color[:, 1],
                m.albedo_color[:, 2], m.albedo_color[:, 3],
                m.alpha_cutoff,
                ((m.flags & (1 << 8)) != 0).astype(jnp.float32),
                ((m.flags & 1) != 0).astype(jnp.float32),
                entity_id.astype(jnp.float32),
                flip_x.astype(jnp.float32),
                # binning columns
                xmin, xmax, ymin, ymax, on_screen.astype(jnp.float32),
                # texture-window columns (for resampling the visible prefix)
                m.uv_size[:, 0], m.uv_size[:, 1],
                m.uv_offset[:, 0], m.uv_offset[:, 1],
                m.albedo_rect[:, 0], m.albedo_rect[:, 1],
                m.albedo_rect[:, 2], m.albedo_rect[:, 3],
            ],
            axis=-1,
        )  # (S, 29)
        ps = packed[order]  # the one gather
        records = ps[:, :16]

        # --- binning (T, S') → (T, K), scatter-free -------------------------
        # only the sorted visible prefix can be drawn (the blend kernel's
        # texture tiles stop at MAX_VISIBLE), so the overlap/cumsum matrix —
        # the biggest fusion of the 2D frame (~17 ms at a 2048-entity
        # capacity, trace) — only needs S' = min(S, MAX_VISIBLE) columns
        ps_bin = ps[: min(s, MAX_VISIBLE)]
        tile_x0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1) * TILE
        tile_y0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 0) * TILE
        tile_x0 = tile_x0.reshape(n_tiles, 1).astype(jnp.float32)
        tile_y0 = tile_y0.reshape(n_tiles, 1).astype(jnp.float32)
        overlap = (
            (ps_bin[None, :, 17] >= tile_x0)
            & (ps_bin[None, :, 16] < tile_x0 + TILE)
            & (ps_bin[None, :, 19] >= tile_y0)
            & (ps_bin[None, :, 18] < tile_y0 + TILE)
            & (ps_bin[None, :, 20] > 0.5)
        )  # (T, S')
        # cum[t, s] = #overlaps among sorted sprites 0..s: the k-th list entry is
        # where cum first reaches k+1. For a nondecreasing row that index equals
        # #{s : cum[t,s] <= k}, so the batched binary search (11 gather steps,
        # ~15 ms at 1080p — trace) collapses to ONE fused compare-and-reduce.
        cum = jnp.cumsum(overlap.astype(jnp.int32), axis=1)
        ranks0 = jnp.arange(k_per_tile, dtype=jnp.int32)  # k = 0..K-1
        tile_list = jnp.sum(
            (cum[:, :, None] <= ranks0[None, None, :]).astype(jnp.int32), axis=1
        )
        tile_list = jnp.where(cum[:, -1:] > ranks0[None, :], tile_list, -1)  # (T, K)
        if s > MAX_VISIBLE:
            # texture tiles exist only for the first MAX_VISIBLE sorted sprites;
            # per-tile lists are ascending, so this masks a suffix (prefix stays valid)
            tile_list = jnp.where(tile_list < MAX_VISIBLE, tile_list, -1)

        tiles = resample_texture_tiles(ps[:MAX_VISIBLE], atlas)
        color, vis = blend_tiles_pallas(
            records, tiles, tile_list, width, height,
            rec_depth=depth[order] if scene_depth is not None else None,
            scene_depth=scene_depth,
        )
        return color, vis

    # gather everything into sorted order (XLA reference path)
    g = lambda a: a[order]
    world_s, mat_s, ent_s, flip_s = g(world), g(material_idx), g(entity_id), g(flip_x)
    xmin_s, xmax_s, ymin_s, ymax_s = g(xmin), g(xmax), g(ymin), g(ymax)
    ok_s = g(on_screen)
    dep_s = g(depth)
    if scene_depth is not None:
        # scene depth in the tile layout the composite loop works in
        sd = jnp.pad(
            scene_depth,
            ((0, ty * TILE - height), (0, tx * TILE - width)),
            constant_values=0.0,
        )
        sd_tiles = sd.reshape(ty, TILE, tx, TILE).transpose(0, 2, 1, 3).reshape(
            n_tiles, TILE, TILE
        )

    # --- binning (T, S) → (T, K) keeping sorted order -----------------------
    tile_x0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 1) * TILE
    tile_y0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx), 0) * TILE
    tile_x0 = tile_x0.reshape(n_tiles, 1).astype(jnp.float32)
    tile_y0 = tile_y0.reshape(n_tiles, 1).astype(jnp.float32)
    overlap = (
        (xmax_s[None, :] >= tile_x0)
        & (xmin_s[None, :] < tile_x0 + TILE)
        & (ymax_s[None, :] >= tile_y0)
        & (ymin_s[None, :] < tile_y0 + TILE)
        & ok_s[None, :]
    )  # (T, S)
    cum = jnp.cumsum(overlap.astype(jnp.int32), axis=1)  # (T, S)
    ranks = jnp.arange(1, k_per_tile + 1, dtype=jnp.int32)  # (K,)
    tile_list = jax.vmap(lambda row: jnp.searchsorted(row, ranks, side="left"))(cum)
    tile_list = jnp.where(cum[:, -1:] >= ranks[None, :], tile_list, -1)  # (T, K)

    # --- per-tile ordered composite (XLA reference path) ---------------------
    # pixel coordinates per tile (T, TILE, TILE)
    px = tile_x0.reshape(n_tiles, 1, 1) + jax.lax.broadcasted_iota(jnp.float32, (1, TILE, TILE), 2) + 0.5
    py = tile_y0.reshape(n_tiles, 1, 1) + jax.lax.broadcasted_iota(jnp.float32, (1, TILE, TILE), 1) + 0.5

    # precompute screen→sprite-local affine inverse per sprite (2D in screen plane):
    # quad corner screen positions p00,p10,p01 form the affine basis
    p00 = jnp.stack([sx[:, 0], sy[:, 0]], axis=-1)[order]
    p10 = jnp.stack([sx[:, 1], sy[:, 1]], axis=-1)[order]
    p01 = jnp.stack([sx[:, 2], sy[:, 2]], axis=-1)[order]
    e0 = p10 - p00  # local +x axis in screen px
    e1 = p01 - p00  # local +y axis
    det = e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0]
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    def blend_step(carry, k):
        color, vis = carry  # (T,TILE,TILE,4), (T,TILE,TILE)
        sid = tile_list[:, k]  # (T,)
        live = sid >= 0
        sid_c = jnp.maximum(sid, 0)

        m_idx = mat_s[sid_c]
        rel = jnp.stack([px - p00[sid_c, 0][:, None, None], py - p00[sid_c, 1][:, None, None]], axis=-1)
        # local quad coords in [0,1]²
        lu = (rel[..., 0] * e1[sid_c, 1][:, None, None] - rel[..., 1] * e1[sid_c, 0][:, None, None]) * inv_det[sid_c][:, None, None]
        lv = (rel[..., 1] * e0[sid_c, 0][:, None, None] - rel[..., 0] * e0[sid_c, 1][:, None, None]) * inv_det[sid_c][:, None, None]
        inside = (lu >= 0) & (lu <= 1) & (lv >= 0) & (lv <= 1) & live[:, None, None]

        u = jnp.where(flip_s[sid_c][:, None, None], 1.0 - lu, lu)
        v = 1.0 - lv  # texture v runs downward
        uv_size = materials.uv_size[m_idx][:, None, None, :]
        uv_off = materials.uv_offset[m_idx][:, None, None, :]
        uv = jnp.stack([u, v], axis=-1) * uv_size + uv_off

        rect = materials.albedo_rect[m_idx][:, None, None, :]
        has_tex = (materials.flags[m_idx] & 1).astype(jnp.bool_)[:, None, None]
        smode = jnp.broadcast_to(materials.sampling_mode[m_idx][:, None, None], uv.shape[:-1])
        texel = sample_atlas_bilinear(atlas, rect, uv, smode)
        texel = jnp.where(has_tex[..., None], texel, 1.0)
        tint = materials.albedo_color[m_idx][:, None, None, :]
        rgba = texel * tint

        # alpha-mask cutoff discard (2d_forward.slang:64-80)
        cutoff = materials.alpha_cutoff[m_idx][:, None, None]
        flags = materials.flags[m_idx][:, None, None]
        is_mask = (flags & (1 << 8)) != 0
        alpha = jnp.where(is_mask & (rgba[..., 3] < cutoff), 0.0, rgba[..., 3])
        alpha = jnp.where(inside, alpha, 0.0)
        if scene_depth is not None:
            # reverse-Z test (no write): drop pixels the scene is nearer than
            alpha = jnp.where(dep_s[sid_c][:, None, None] > sd_tiles, alpha, 0.0)

        color_rgb = color[..., :3] * (1 - alpha[..., None]) + rgba[..., :3] * alpha[..., None]
        color_a = color[..., 3] * (1 - alpha) + alpha
        new_color = jnp.concatenate([color_rgb, color_a[..., None]], axis=-1)
        new_vis = jnp.where(alpha > 0.5, ent_s[sid_c][:, None, None], vis)
        return (new_color, new_vis), ()

    init_color = jnp.zeros((n_tiles, TILE, TILE, 4), jnp.float32)
    init_vis = jnp.full((n_tiles, TILE, TILE), -1, jnp.int32)
    (color, vis), _ = jax.lax.scan(blend_step, (init_color, init_vis), jnp.arange(k_per_tile))

    # --- untile -------------------------------------------------------------
    color = color.reshape(ty, tx, TILE, TILE, 4).transpose(0, 2, 1, 3, 4).reshape(ty * TILE, tx * TILE, 4)
    vis = vis.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(ty * TILE, tx * TILE)
    return color[:height, :width], vis[:height, :width]
