"""Screen-space reflections (the SSSR-style pass of BASELINE config 5).

The reference lists SSSR in its README but ships no implementation in this
snapshot (`/root/reference/README.md`; no `sssr` shader exists under
`Oxylus/src/Render/Shaders/`) — this pass fills the config-5 surface with a
TPU-shaped design: a fixed-step screen-space march of the reflected eye ray
against the depth buffer (the same bounded-gather pattern as the contact-shadow
march, `RendererInstance.cpp:855-886`), run at quarter resolution and composited
by Fresnel × (1 - roughness).

Gathers are the expensive primitive on this target (PERF_NOTES.md): each march
step is ONE quarter-res image gather, and the final color fetch is one more.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.imgops import point_downsample as _pds
from ..utils.math3d import mat4_point_image as _mat4_point

Array = jax.Array


@partial(jax.jit, static_argnames=("steps",))
def ssr_trace(
    depth: Array,       # (H, W) reverse-Z screen depth
    world_pos: Array,   # (H, W, 3)
    normal: Array,      # (H, W, 3)
    hit: Array,         # (H, W) bool geometry mask
    hdr: Array,         # (H, W, 3) lit color to reflect
    camera_pos: Array,  # (3,)
    view_proj: Array,   # (4, 4)
    steps: int = 8,
    max_distance: float = 20.0,
    thickness: float = 0.6,
) -> tuple[Array, Array]:
    """Returns (reflection color (H, W, 3), confidence (H, W) in [0, 1])."""
    h, w = depth.shape
    view = world_pos - camera_pos[None, None, :]
    view_len = jnp.linalg.norm(view, axis=-1, keepdims=True)
    vdir = view / jnp.maximum(view_len, 1e-6)
    rdir = vdir - 2.0 * jnp.sum(vdir * normal, axis=-1, keepdims=True) * normal

    found = jnp.zeros((h, w), jnp.bool_)
    hit_x = jnp.zeros((h, w), jnp.int32)
    hit_y = jnp.zeros((h, w), jnp.int32)
    edge = jnp.ones((h, w), jnp.float32)
    for i in range(1, steps + 1):
        t = max_distance * (i / steps) ** 2  # finer steps near the surface
        sample = world_pos + rdir * t
        clip = _mat4_point(view_proj, sample)
        wc = jnp.maximum(clip[..., 3], 1e-6)
        ndc = clip[..., :3] / wc[..., None]
        sx = ((ndc[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32)
        sy = ((ndc[..., 1] * 0.5 + 0.5) * h).astype(jnp.int32)
        inside = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h) & (clip[..., 3] > 0)
        sxc = jnp.clip(sx, 0, w - 1)
        syc = jnp.clip(sy, 0, h - 1)
        scene_z = depth[syc, sxc]
        ray_z = ndc[..., 2]
        # reverse-Z: the scene surface occludes the ray when it is nearer
        # (larger) than the ray sample, within `thickness` in linear-ish terms
        blocked = (scene_z > ray_z + 1e-5) & (scene_z - ray_z < thickness * 0.05)
        new_hit = inside & blocked & ~found
        hit_x = jnp.where(new_hit, sxc, hit_x)
        hit_y = jnp.where(new_hit, syc, hit_y)
        found = found | new_hit

    color = hdr[hit_y, hit_x]
    # fade near screen edges (information leaves the screen) and by distance
    u = hit_x.astype(jnp.float32) / w
    v = hit_y.astype(jnp.float32) / h
    edge = (
        jnp.clip(u * 10.0, 0, 1) * jnp.clip((1 - u) * 10.0, 0, 1)
        * jnp.clip(v * 10.0, 0, 1) * jnp.clip((1 - v) * 10.0, 0, 1)
    )
    conf = jnp.where(found & hit, edge, 0.0)
    return color, conf


def apply_ssr(
    hdr: Array,
    gbuffer: dict,
    depth: Array,
    camera_pos: Array,
    view_proj: Array,
    steps: int = 8,
    max_roughness: float = 0.5,
    scale: int = 8,
) -> Array:
    """Reduced-res SSR composited over the lit image. Smooth surfaces only;
    Schlick Fresnel drives the mix (reference BRDF conventions, pbr.slang).

    The march runs at 1/`scale` res: gathers price per gathered ROW on this
    target, so each step costs march-pixels × ~10 ns (at 1/4 res the 8-step
    march was 10 ms of a 37 ms frame — trace); 1/8 cuts it 4× and the Fresnel
    composite keeps full-res edges."""
    h, w = depth.shape
    q = lambda a: _pds(a, scale)
    color4, conf4 = ssr_trace(
        q(depth), q(gbuffer["world_pos"]), q(gbuffer["normal"]), q(gbuffer["hit"]),
        _pds(hdr, scale), camera_pos, view_proj, steps=steps,
    )
    # premultiplied-confidence upsampling: texels where the march missed hold
    # hdr[0,0] (hit_x=hit_y=0) — weight them out of the bilinear average instead
    # of letting that unrelated corner color bleed across reflection boundaries
    color = jax.image.resize(color4 * conf4[..., None], (h, w, 3), method="linear")
    conf = jax.image.resize(conf4, (h, w), method="linear")
    color = color / jnp.maximum(conf[..., None], 1e-4)

    rough = gbuffer["roughness"]
    metal = gbuffer["metallic"]
    albedo = gbuffer["albedo"][..., :3]  # decode path carries RGBA
    nrm = gbuffer["normal"]
    view = camera_pos[None, None, :] - gbuffer["world_pos"]
    vdir = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-6)
    n_dot_v = jnp.clip(jnp.sum(nrm * vdir, axis=-1), 0.0, 1.0)
    f0 = 0.04 * (1.0 - metal[..., None]) + albedo * metal[..., None]
    fresnel = f0 + (1.0 - f0) * ((1.0 - n_dot_v[..., None]) ** 5)
    gloss = jnp.clip(1.0 - rough / max_roughness, 0.0, 1.0)
    weight = conf[..., None] * fresnel * gloss[..., None]
    weight = jnp.where(gbuffer["hit"][..., None], weight, 0.0)
    return hdr * (1.0 - weight) + color * weight
