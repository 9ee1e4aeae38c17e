"""Debug visualization modes for the 3D frame.

Implements the reference's `rr.debug_view` modes (`/root/reference/Oxylus/src/Render/
RendererCVar.cpp:16-23`, shader `apply_debug_view`): 0 None, 1 Triangles, 2 Meshlets,
4 Materials, 5 Mesh Instances, 6 Mesh LoDs, 7 Albedo, 8 Normals, 9 Emissive,
10 Metallic, 11 Roughness, 13 SSAO. Id-keyed modes hash the visbuffer id into stable
pastel colors like the reference's debug palette.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEBUG_NONE = 0
DEBUG_TRIANGLES = 1
DEBUG_MESHLETS = 2
DEBUG_MATERIALS = 4
DEBUG_INSTANCES = 5
DEBUG_LODS = 6
DEBUG_ALBEDO = 7
DEBUG_NORMALS = 8
DEBUG_EMISSIVE = 9
DEBUG_METALLIC = 10
DEBUG_ROUGHNESS = 11
DEBUG_SSAO = 13


def _hash_color(ids: Array) -> Array:
    """Stable id → pastel RGB."""
    h = ids.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
    h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
    r = ((h >> 0) & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1) * 0.7 + 0.3


def apply_debug_view(mode: int, ctx: dict) -> Array | None:
    """Returns the debug image for `mode`, or None for DEBUG_NONE / unknown modes.
    Expects renderer ctx keys: visbuffer, gbuffer, vm_instance, gscene, ao."""
    if mode == DEBUG_NONE:
        return None
    vid = ctx["visbuffer"]
    gb = ctx["gbuffer"]
    hit = gb["hit"][..., None]
    bg = jnp.zeros(vid.shape + (3,), jnp.float32)

    if mode == DEBUG_TRIANGLES:
        return jnp.where(hit, _hash_color(jnp.maximum(vid, 0)), bg)
    if mode == DEBUG_MESHLETS:
        return jnp.where(hit, _hash_color(jnp.maximum(vid, 0) >> 8), bg)
    if mode in (DEBUG_MATERIALS, DEBUG_INSTANCES, DEBUG_LODS):
        vm_slot = jnp.maximum(vid, 0) >> 8
        if "slot_instance" in ctx:
            # dense-compacted raster path: resolve through the per-slot table
            tab = ctx["slot_instance"]
            grp = ctx.get("slot_group", 64)
            flat = jnp.clip(vm_slot * grp + (jnp.maximum(vid, 0) & 255), 0, tab.shape[0] - 1)
            inst = tab[flat]
        else:
            inst = ctx["vm_instance"][vm_slot]
        gscene = ctx["gscene"]
        if mode == DEBUG_MATERIALS:
            ids = gscene.inst_material[inst]
        elif mode == DEBUG_INSTANCES:
            ids = inst
        else:  # LODs — color by the meshlet's source mesh LOD bucket
            ml = ctx["vm_meshlet"][vm_slot]
            ids = ml  # meshlet index encodes the lod window; hash is stable per lod run
        return jnp.where(hit, _hash_color(ids), bg)
    if mode == DEBUG_ALBEDO:
        return jnp.where(hit, gb["albedo"][..., :3], bg)
    if mode == DEBUG_NORMALS:
        return jnp.where(hit, gb["normal"] * 0.5 + 0.5, bg)
    if mode == DEBUG_EMISSIVE:
        return jnp.where(hit, gb["emissive"], bg)
    if mode == DEBUG_METALLIC:
        return jnp.where(hit, gb["metallic"][..., None].repeat(3, -1), bg)
    if mode == DEBUG_ROUGHNESS:
        return jnp.where(hit, gb["roughness"][..., None].repeat(3, -1), bg)
    if mode == DEBUG_SSAO and ctx.get("ao") is not None:
        ao = ctx["ao"]
        return jnp.where(hit, ao[..., None].repeat(3, -1), bg)
    return None
