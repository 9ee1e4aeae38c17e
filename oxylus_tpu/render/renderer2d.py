"""2D render path: sprite queue assembly + tiled rasterization.

Replaces the reference's `RenderQueue2D` build (`/root/reference/Oxylus/src/Render/
RendererInstance.cpp:1336-1395`) and 2D forward passes (`:945-1088`). Sprite instances
come straight from the SceneState SoA (SpriteComponent mask + world matrices); sprite
*animation* UV windows are derived on device from the animation clock (the reference
mutates material uv_offset on the CPU each frame — here it's a pure function).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.material import GPUMaterials, empty_gpu_materials
from ..ops.raster2d import rasterize_sprites
from ..utils import math3d
from .camera import CameraMatrices

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["materials", "atlas", "entity_material_idx"],
    meta_fields=[],
)
@dataclasses.dataclass
class SpriteBatchBindings:
    """Host-built, device-resident bindings for the 2D path: the material table,
    atlas, and the per-entity material index map (rebuilt on asset/scene edits only)."""

    materials: GPUMaterials
    atlas: Array                  # (A, A, 4) uint8
    entity_material_idx: Array    # (N,) i32 — sprite entity → material slot


def default_bindings(n_entities: int, capacity: int = 256, atlas_size: int = 64) -> SpriteBatchBindings:
    return SpriteBatchBindings(
        materials=empty_gpu_materials(capacity),
        atlas=jnp.zeros((atlas_size, atlas_size, 4), jnp.uint8),
        entity_material_idx=jnp.zeros((n_entities,), jnp.int32),
    )


def sprite_animation_uv(state, entity_idx: Array) -> tuple[Array, Array]:
    """Per-sprite UV window from SpriteAnimationComponent (`Scene.cpp:988-1037`):
    frame = floor(current_time * fps), laid out on a `columns`-wide sheet; `inverted`
    plays backwards. Returns (uv_size (S,2), uv_offset (S,2)) multipliers applied on
    top of the material's own uv transform; identity when no animation."""
    sa = state.comp["SpriteAnimationComponent"]
    ident = (
        isinstance(entity_idx, jax.Array)
        and entity_idx.shape[0] == state.alive.shape[0]
    )
    # callers pass arange(n): skip the per-field gathers (gathers are the costly
    # primitive on this target — PERF_NOTES.md)
    ix = (lambda a: a) if ident else (lambda a: a[entity_idx])
    has = ix(state.mask["SpriteAnimationComponent"])
    num = jnp.maximum(ix(sa["num_frames"]), 1)
    fps = ix(sa["fps"]).astype(jnp.float32)
    cols = jnp.maximum(ix(sa["columns"]), 1)
    t = ix(sa["current_time"])
    frame = jnp.floor(t * fps).astype(jnp.int32)
    frame = jnp.clip(frame, 0, num - 1)
    frame = jnp.where(ix(sa["inverted"]), num - 1 - frame, frame)
    rows = (num + cols - 1) // cols
    fx = (frame % cols).astype(jnp.float32)
    fy = (frame // cols).astype(jnp.float32)
    size = jnp.stack([1.0 / cols.astype(jnp.float32), 1.0 / rows.astype(jnp.float32)], axis=-1)
    offset = jnp.stack([fx, fy], axis=-1) * size
    ident_size = jnp.ones_like(size)
    ident_off = jnp.zeros_like(offset)
    return (
        jnp.where(has[:, None], size, ident_size),
        jnp.where(has[:, None], offset, ident_off),
    )


def render_2d(
    state,
    camera: CameraMatrices,
    bindings: SpriteBatchBindings,
    *,
    width: int,
    height: int,
    k_per_tile: int = 64,
) -> tuple[Array, Array]:
    """Rasterize all sprite entities. Returns (color (H,W,4), visbuffer (H,W) i32)."""
    n = state.alive.shape[0]
    sp = state.comp["SpriteComponent"]
    mask = state.mask["SpriteComponent"] & state.alive

    entity_idx = jnp.arange(n, dtype=jnp.int32)
    anim_size, anim_off = sprite_animation_uv(state, entity_idx)

    mat_idx = bindings.entity_material_idx
    # compose animation uv window into material uv transform by building per-sprite
    # override arrays (materials are shared; uv anim is per-entity)
    mats = bindings.materials
    uv_size = mats.uv_size[mat_idx] * anim_size
    uv_offset = mats.uv_offset[mat_idx] + anim_off * mats.uv_size[mat_idx]
    per_sprite_mats = dataclasses.replace(
        mats,
        uv_size=uv_size,
        uv_offset=uv_offset,
        albedo_color=mats.albedo_color[mat_idx],
        emissive_color=mats.emissive_color[mat_idx],
        roughness_factor=mats.roughness_factor[mat_idx],
        metallic_factor=mats.metallic_factor[mat_idx],
        alpha_cutoff=mats.alpha_cutoff[mat_idx],
        flags=mats.flags[mat_idx],
        albedo_rect=mats.albedo_rect[mat_idx],
        normal_rect=mats.normal_rect[mat_idx],
        emissive_rect=mats.emissive_rect[mat_idx],
        mr_rect=mats.mr_rect[mat_idx],
        occlusion_rect=mats.occlusion_rect[mat_idx],
        sampling_mode=mats.sampling_mode[mat_idx],
    )

    return rasterize_sprites(
        world=state.world,
        material_idx=entity_idx,  # per-sprite material table is entity-indexed now
        entity_id=entity_idx,
        layer=sp["layer"].astype(jnp.int32),
        sort_y=sp["sort_y"],
        flip_x=sp["flip_x"],
        valid=mask,
        view_proj=camera.view_projection,
        materials=per_sprite_mats,
        atlas=bindings.atlas,
        width=width,
        height=height,
        k_per_tile=k_per_tile,
    )


def particle_render_data(state, camera: CameraMatrices | None = None):
    """Per-particle render instances from the pool: world matrices (XY-plane quads or
    camera-facing billboards), tint colors and validity.

    Over-lifetime color/size/rotation are *pure functions of age* evaluated here at
    render time (the reference mutates particle entities every frame on the CPU —
    `Scene.cpp:859-959`; same curves, no storage)."""
    pool = state.particles
    psys = state.comp["ParticleSystemComponent"]
    em = jnp.maximum(pool.emitter, 0)

    # gathers dominate on this target (PERF_NOTES.md): concat all needed emitter
    # fields into ONE (N, F) matrix, gather rows once, then slice columns (fused)
    _fields = [
        ("start_color", 4), ("color_over_lifetime_enabled", 1),
        ("color_over_lifetime_start", 4), ("color_over_lifetime_end", 4),
        ("color_by_speed_min_speed", 1), ("color_by_speed_max_speed", 1),
        ("color_by_speed_enabled", 1), ("color_by_speed_start", 4),
        ("color_by_speed_end", 4), ("start_size", 4),
        ("size_over_lifetime_enabled", 1), ("size_over_lifetime_start", 3),
        ("size_over_lifetime_end", 3), ("size_by_speed_enabled", 1),
        ("size_by_speed_start", 3), ("size_by_speed_end", 3),
        ("rotation_over_lifetime_start", 4), ("rotation_over_lifetime_end", 4),
        ("rotation_over_lifetime_enabled", 1), ("start_rotation", 4),
    ]
    cols = []
    for name, width_ in _fields:
        v = psys[name]
        cols.append(v.astype(jnp.float32)[:, None] if v.ndim == 1 else v[:, :width_].astype(jnp.float32))
    packed = jnp.concatenate(cols, axis=1)[em]  # (P, F) — the one gather
    _off = {}
    o = 0
    for name, width_ in _fields:
        _off[name] = (o, o + width_)
        o += width_

    def g(k):
        lo, hi = _off[k]
        out = packed[:, lo:hi]
        if hi - lo == 1:
            return out[:, 0] > 0.5 if k.endswith("enabled") else out[:, 0]
        return out

    frac = jnp.clip(pool.age / jnp.maximum(pool.lifetime, 1e-6), 0.0, 1.0)[:, None]
    speed = jnp.linalg.norm(pool.vel, axis=-1, keepdims=True)

    color = g("start_color")
    col_live = jnp.where(
        g("color_over_lifetime_enabled")[:, None],
        g("color_over_lifetime_start") + (g("color_over_lifetime_end") - g("color_over_lifetime_start")) * frac,
        jnp.ones_like(color),
    )
    sp_t = jnp.clip(
        (speed - g("color_by_speed_min_speed")[:, None])
        / jnp.maximum((g("color_by_speed_max_speed") - g("color_by_speed_min_speed"))[:, None], 1e-6),
        0.0,
        1.0,
    )
    col_speed = jnp.where(
        g("color_by_speed_enabled")[:, None],
        g("color_by_speed_start") + (g("color_by_speed_end") - g("color_by_speed_start")) * sp_t,
        jnp.ones_like(color),
    )
    color = color * col_live * col_speed

    size = g("start_size")[:, :3]
    size_live = jnp.where(
        g("size_over_lifetime_enabled")[:, None],
        g("size_over_lifetime_start") + (g("size_over_lifetime_end") - g("size_over_lifetime_start")) * frac,
        jnp.ones_like(size),
    )
    size_speed = jnp.where(
        g("size_by_speed_enabled")[:, None],
        g("size_by_speed_start") + (g("size_by_speed_end") - g("size_by_speed_start")) * sp_t,
        jnp.ones_like(size),
    )
    size = size * size_live * size_speed

    rot = math3d.quat_slerp(
        g("rotation_over_lifetime_start"), g("rotation_over_lifetime_end"), frac[:, 0]
    )
    rot = jnp.where(g("rotation_over_lifetime_enabled")[:, None], rot, g("start_rotation"))

    world = math3d.trs_to_mat4(pool.pos, rot, size)
    if camera is not None:
        # billboard: replace the rotation block with the camera basis
        basis = jnp.stack([camera.right, camera.up, camera.forward], axis=-1)  # (3,3) cols
        scaled = basis[None, :, :] * size[:, None, :]
        world = world.at[:, :3, :3].set(scaled)
    return world, color, pool.alive, em


@partial(jax.jit, static_argnames=("width", "height", "k_per_tile", "billboard"))
def render_2d_with_particles(
    state,
    camera: CameraMatrices,
    bindings: SpriteBatchBindings,
    *,
    width: int,
    height: int,
    k_per_tile: int = 64,
    billboard: bool = False,
) -> tuple[Array, Array]:
    """Sprites + particle billboards in one sorted, tiled pass (the reference feeds
    particles through the same RenderQueue2D, `RendererInstance.cpp:1336-1395`)."""
    n = state.alive.shape[0]
    sp = state.comp["SpriteComponent"]
    sprite_mask = state.mask["SpriteComponent"] & state.alive

    entity_idx = jnp.arange(n, dtype=jnp.int32)
    anim_size, anim_off = sprite_animation_uv(state, entity_idx)
    mats = bindings.materials
    mat_idx = bindings.entity_material_idx

    p_world, p_color, p_valid, p_emitter = particle_render_data(
        state, camera if billboard else None
    )
    m = p_world.shape[0]

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    world = cat(state.world, p_world)
    layer = cat(sp["layer"].astype(jnp.int32), jnp.full((m,), 1 << 20, jnp.int32))
    sort_y = cat(sp["sort_y"], jnp.zeros((m,), jnp.bool_))
    flip_x = cat(sp["flip_x"], jnp.zeros((m,), jnp.bool_))
    valid = cat(sprite_mask, p_valid)
    entity_id = cat(entity_idx, p_emitter)

    # per-op (especially gather) cost dominates on this target: pack the material
    # table into one matrix, gather the per-entity rows once, and expose the
    # combined sprite+particle table as column slices (fused) of a single array.
    mat_packed = jnp.concatenate(
        [
            mats.albedo_color,                      # 0:4
            mats.alpha_cutoff[:, None],             # 4
            mats.flags.astype(jnp.float32)[:, None],  # 5 (bits < 2^24, f32-exact)
            mats.uv_size,                           # 6:8
            mats.uv_offset,                         # 8:10
            mats.albedo_rect,                       # 10:14
        ],
        axis=1,
    )
    spr = mat_packed[mat_idx]  # (n, 14) — the one gather
    spr_adj = jnp.concatenate(
        [
            spr[:, 0:6],
            spr[:, 6:8] * anim_size,
            spr[:, 8:10] + anim_off * spr[:, 6:8],
            spr[:, 10:14],
        ],
        axis=1,
    )
    part = jnp.concatenate(
        [
            p_color,                                   # tint
            jnp.zeros((m, 1)),                         # cutoff
            jnp.full((m, 1), float(1 << 9)),           # flags: alpha blend, no texture
            jnp.ones((m, 2)), jnp.zeros((m, 2)),       # uv window
            jnp.zeros((m, 4)),                         # rect
        ],
        axis=1,
    )
    allm = cat(spr_adj, part)  # (n+m, 14)
    combined = dataclasses.replace(
        mats,
        albedo_color=allm[:, 0:4],
        alpha_cutoff=allm[:, 4],
        flags=allm[:, 5].astype(jnp.uint32),
        uv_size=allm[:, 6:8],
        uv_offset=allm[:, 8:10],
        albedo_rect=allm[:, 10:14],
        sampling_mode=jnp.zeros(n + m, jnp.int32),
    )

    return rasterize_sprites(
        world=world,
        material_idx=jnp.arange(n + m, dtype=jnp.int32),
        entity_id=entity_id,
        layer=layer,
        sort_y=sort_y,
        flip_x=flip_x,
        valid=valid,
        view_proj=camera.view_projection,
        materials=combined,
        atlas=bindings.atlas,
        width=width,
        height=height,
        k_per_tile=k_per_tile,
    )


def render_particles_3d(
    state,
    camera: CameraMatrices,
    scene_depth: Array,
    atlas: Array,
    materials,
    *,
    width: int,
    height: int,
    k_per_tile: int = 64,
) -> Array:
    """Particle billboards as a depth-tested premultiplied RGBA layer over a 3D
    frame — the reference's Forward2D stage feeding particles through the same
    sprite queue after PBR (`RendererInstance.cpp:945-1088`, `:1336-1395`).
    Billboards face the camera, are sorted back-to-front, alpha-blended, and
    depth-TESTED (reverse-Z, no write) against the opaque scene depth."""
    p_world, p_color, p_valid, p_emitter = particle_render_data(state, camera)
    m = p_world.shape[0]
    part_mats = dataclasses.replace(
        materials,
        albedo_color=p_color,
        alpha_cutoff=jnp.zeros(m, jnp.float32),
        flags=jnp.full(m, 1 << 9, jnp.uint32),      # alpha blend, no texture
        uv_size=jnp.ones((m, 2), jnp.float32),
        uv_offset=jnp.zeros((m, 2), jnp.float32),
        albedo_rect=jnp.zeros((m, 4), jnp.float32),
        sampling_mode=jnp.zeros(m, jnp.int32),
    )
    color, _vis = rasterize_sprites(
        world=p_world,
        material_idx=jnp.arange(m, dtype=jnp.int32),
        entity_id=p_emitter,
        layer=jnp.zeros(m, jnp.int32),
        sort_y=jnp.zeros(m, jnp.bool_),
        flip_x=jnp.zeros(m, jnp.bool_),
        valid=p_valid,
        view_proj=camera.view_projection,
        materials=part_mats,
        atlas=atlas,
        width=width,
        height=height,
        k_per_tile=k_per_tile,
        scene_depth=scene_depth,
    )
    return color


def build_entity_material_map(scene, uuid_to_slot: dict[str, int]) -> np.ndarray:
    """Host: map each entity's SpriteComponent.material UUID to a material slot."""
    from ..core import uuid as uuidlib

    n = scene.spec.padded_entities()
    out = np.zeros(n, np.int32)
    mat = scene._comp_data["SpriteComponent"]["material"]
    mask = scene._comp_mask["SpriteComponent"]
    for i in range(n):
        if mask[i]:
            u = uuidlib.u64_pair_to_uuid(mat[i][0], mat[i][1])
            out[i] = uuid_to_slot.get(u, 0)
    return out
