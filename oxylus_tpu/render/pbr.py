"""PBR lighting: GGX/Smith/Schlick BRDF + punctual lights, applied fullscreen.

Semantics pinned from the reference (`/root/reference/Oxylus/src/Render/Shaders/
pbr.slang`, SURVEY A.4): GGX NDF, height-correlated Smith visibility, Schlick Fresnel
with roughness-aware ambient term, metallic workflow (F0 = lerp(0.04, albedo, metal)),
directional + point + spot lights with smooth distance/cone attenuation, MAX_LIGHTS=256
(`SceneGPU.hpp:230`). Applied as one fused fullscreen array op over the GBuffer.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_LIGHTS = 256
LIGHT_DIRECTIONAL = 0
LIGHT_SPOT = 1
LIGHT_POINT = 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kind", "color", "intensity", "position", "direction", "radius", "inner_cone", "outer_cone", "valid", "count"],
    meta_fields=[],
)
@dataclasses.dataclass
class Lights:
    kind: Array       # (L,) i32
    color: Array      # (L, 3)
    intensity: Array  # (L,)
    position: Array   # (L, 3)
    direction: Array  # (L, 3) normalized, points *from* the light
    radius: Array     # (L,)
    inner_cone: Array # (L,) radians
    outer_cone: Array # (L,) radians
    valid: Array      # (L,) bool
    count: Array      # () i32 — live lights; the shading loop runs only this far


def lights_from_state(state, capacity: int = MAX_LIGHTS) -> Lights:
    """Gather LightComponent entities into the fixed light table
    (the lights query of `RendererInstance.cpp:1266-1334`)."""
    from ..ops.compact import masked_compact

    lc = state.comp["LightComponent"]
    mask = state.mask["LightComponent"] & state.alive
    idx, valid, count = masked_compact(mask, capacity)
    world = state.world[idx]
    position = world[:, :3, 3]
    # light direction = world -Z? The reference orients directional/spot lights by the
    # entity's rotation: forward = -Z column transformed
    fwd = -world[:, :3, 2]
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd, axis=-1, keepdims=True), 1e-9)
    return Lights(
        kind=lc["type"][idx],
        color=lc["color"][idx],
        intensity=lc["intensity"][idx],
        position=position,
        direction=fwd,
        radius=lc["radius"][idx],
        inner_cone=jnp.radians(lc["inner_cone_angle"][idx]),
        outer_cone=jnp.radians(lc["outer_cone_angle"][idx]),
        valid=valid,
        count=count,
    )


def _d_ggx(noh, rough):
    a = rough * rough
    a2 = a * a
    d = noh * noh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-9)


def _v_smith_height_correlated(nov, nol, rough):
    a = rough * rough
    a2 = a * a
    gv = nol * jnp.sqrt(jnp.maximum(nov * nov * (1.0 - a2) + a2, 1e-9))
    gl = nov * jnp.sqrt(jnp.maximum(nol * nol * (1.0 - a2) + a2, 1e-9))
    return 0.5 / jnp.maximum(gv + gl, 1e-9)


def _f_schlick(voh, f0):
    return f0 + (1.0 - f0) * (1.0 - voh) ** 5


def brdf(n, v, l, albedo, metallic, roughness):
    """Cook-Torrance specular + Lambert diffuse, metallic workflow (pbr.slang:61-88)."""
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    nol = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    nov = jnp.maximum(jnp.sum(n * v, axis=-1), 1e-4)
    noh = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    voh = jnp.maximum(jnp.sum(v * h, axis=-1), 0.0)

    rough = jnp.clip(roughness, 0.045, 1.0)
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]

    d = _d_ggx(noh, rough)
    vis = _v_smith_height_correlated(nov, nol, rough)
    f = _f_schlick(voh[..., None], f0)
    specular = (d * vis)[..., None] * f
    diffuse = albedo * (1.0 - metallic[..., None]) / jnp.pi
    return (diffuse + specular) * nol[..., None]


def apply_pbr(
    gbuffer: dict[str, Array],
    lights: Lights,
    camera_pos: Array,
    ambient_color: Array,
    background: Array | None = None,
    ao: Array | None = None,
    shadow: Array | None = None,
) -> Array:
    """Fullscreen lighting (pbr_apply, `src/Render/Passes/PBR.cpp:313-540`).
    `shadow` (H, W) multiplies the first directional light; `ao` multiplies ambient.
    Returns linear HDR (H, W, 3)."""
    n = gbuffer["normal"]
    wp = gbuffer["world_pos"]
    albedo = gbuffer["albedo"][..., :3]
    metallic = gbuffer["metallic"]
    roughness = gbuffer["roughness"]

    v = camera_pos[None, None, :] - wp
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)

    def add_light(i, acc):
        kind = lights.kind[i]
        lvalid = lights.valid[i]

        to_light = lights.position[i][None, None, :] - wp
        dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
        l_point = to_light / jnp.maximum(dist, 1e-9)
        l_dir = -lights.direction[i][None, None, :]
        l = jnp.where(kind == LIGHT_DIRECTIONAL, l_dir, l_point)

        # punctual attenuation: inverse-square with radius window (pbr.slang:89+)
        d2 = (dist[..., 0] / jnp.maximum(lights.radius[i], 1e-4)) ** 2
        window = jnp.clip(1.0 - d2 * d2, 0.0, 1.0) ** 2
        atten_pt = window / jnp.maximum(dist[..., 0] * dist[..., 0], 1e-4)
        # spot cone falloff
        cd = jnp.sum(-l * (-lights.direction[i][None, None, :]), axis=-1)
        cos_outer = jnp.cos(lights.outer_cone[i] * 0.5)
        cos_inner = jnp.cos(jnp.maximum(lights.inner_cone[i], 1e-3) * 0.5)
        spot = jnp.clip((cd - cos_outer) / jnp.maximum(cos_inner - cos_outer, 1e-4), 0.0, 1.0)
        atten = jnp.where(
            kind == LIGHT_DIRECTIONAL,
            1.0,
            jnp.where(kind == LIGHT_SPOT, atten_pt * spot * spot, atten_pt),
        )
        if shadow is not None:
            atten = jnp.where((kind == LIGHT_DIRECTIONAL) & (i == 0), atten * shadow, atten)

        radiance = lights.color[i][None, None, :] * lights.intensity[i]
        contrib = brdf(n, v, l, albedo, metallic, roughness) * radiance * atten[..., None]
        return acc + jnp.where(lvalid, 1.0, 0.0) * contrib

    # loop only over live lights (traced bound → while_loop; empty slots cost nothing)
    direct = jax.lax.fori_loop(0, lights.count, add_light, jnp.zeros_like(albedo))

    if ambient_color.ndim == 2:  # (9, 3) SH coefficients → directional sky irradiance
        from .sky import eval_sh_ambient

        ambient = albedo * eval_sh_ambient(ambient_color, n)
    else:
        ambient = albedo * ambient_color[None, None, :]
    if ao is not None:
        ambient = ambient * ao[..., None]
    hdr = direct + ambient + gbuffer["emissive"]

    hitf = gbuffer["hit"][..., None]
    if background is None:
        background = jnp.zeros_like(hdr)
    return jnp.where(hitf, hdr, background)
