"""2D render path: sprite queue assembly + tiled rasterization.

Replaces the reference's `RenderQueue2D` build (`/root/reference/Oxylus/src/Render/
RendererInstance.cpp:1336-1395`) and 2D forward passes (`:945-1088`). Sprite instances
come straight from the SceneState SoA (SpriteComponent mask + world matrices); sprite
*animation* UV windows are derived on device from the animation clock (the reference
mutates material uv_offset on the CPU each frame — here it's a pure function).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.material import GPUMaterials, empty_gpu_materials
from ..ops.raster2d import rasterize_sprites
from .camera import CameraMatrices

Array = jax.Array


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
    has = state.mask["SpriteAnimationComponent"][entity_idx]
    num = jnp.maximum(sa["num_frames"][entity_idx], 1)
    fps = sa["fps"][entity_idx].astype(jnp.float32)
    cols = jnp.maximum(sa["columns"][entity_idx], 1)
    t = sa["current_time"][entity_idx]
    frame = jnp.floor(t * fps).astype(jnp.int32)
    frame = jnp.clip(frame, 0, num - 1)
    frame = jnp.where(sa["inverted"][entity_idx], num - 1 - frame, frame)
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
