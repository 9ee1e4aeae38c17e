"""Visbuffer decode: per-pixel triangle attribute reconstruction → GBuffer.

Re-implements the reference's fullscreen decode (`/root/reference/Oxylus/src/Render/
Shaders/passes/visbuffer_decode.slang:44-194`): from the packed 24|8 visbuffer id,
fetch the triangle's three clip-space vertices, reconstruct perspective-correct
barycentrics analytically at the pixel center, interpolate normal/UV, evaluate the
material (atlas fetches), and emit the GBuffer planes the lighting pass consumes
(albedo, world normal, emissive, metallic/roughness/occlusion, world position).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sampling import sample_atlas_bilinear

Array = jax.Array


@partial(jax.jit, static_argnames=("width", "height", "full_height"))
def decode_visbuffer(
    vid: Array,          # (H, W) i32 packed (vm_slot << 8 | tri), -1 = sky
    setup: dict,         # from setup_triangles: clip, gvert, per-tri data
    vm_instance: Array,  # (VM,)
    gscene,
    entity_world: Array,
    materials,           # GPUMaterials
    atlas: Array,
    *,
    width: int,
    height: int,
    row_offset: Array | int = 0,   # band decode: global row of vid[0] (tile-sharded frame)
    full_height: int | None = None,  # full framebuffer height when vid is a band
) -> dict[str, Array]:
    hit = vid >= 0
    pid = jnp.maximum(vid, 0)
    vm_slot = pid >> 8
    # raster slots are 2 per source triangle (near-plane clipping, ops/setup3d.py)
    tri = (pid & 0xFF) // setup["slots_per_tri"]

    clip = setup["clip"][vm_slot, tri]  # (H, W, 3, 4)
    packed = setup["packed_verts"][vm_slot, tri]  # (H, W, 3, 8): pos | nrm | uv

    # pixel NDC
    fh = full_height if full_height is not None else height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (row_offset + jnp.arange(height, dtype=jnp.float32) + 0.5) / fh * 2.0 - 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (height, width))
    ndc_y = jnp.broadcast_to(ys[:, None], (height, width))

    # analytic perspective-correct barycentrics (visbuffer_decode.slang:44-91):
    # edge functions in NDC via 2D homogeneous cross products of clip verts
    cx = clip[..., 0]  # (H, W, 3)
    cy = clip[..., 1]
    cw = clip[..., 3]
    # signed areas of sub-triangles formed with the pixel ray: use the 3x3 determinant
    # formulation on (x/w - px, y/w - py) scaled by 1/w
    inv_w = 1.0 / jnp.maximum(jnp.abs(cw), 1e-9) * jnp.sign(cw)
    px_ = cx * inv_w - ndc_x[..., None]
    py_ = cy * inv_w - ndc_y[..., None]
    # edge i spans verts (i+1, i+2): area_i = cross(p_{i+1}, p_{i+2})
    def cross2(i, j):
        return px_[..., i] * py_[..., j] - px_[..., j] * py_[..., i]

    a0 = cross2(1, 2)
    a1 = cross2(2, 0)
    a2 = cross2(0, 1)
    # perspective weights: bary_i ∝ a_i / w_i
    b0 = a0 * inv_w[..., 0]
    b1 = a1 * inv_w[..., 1]
    b2 = a2 * inv_w[..., 2]
    bsum = b0 + b1 + b2
    inv_sum = jnp.where(jnp.abs(bsum) > 1e-12, 1.0 / bsum, 0.0)
    bary = jnp.stack([b0, b1, b2], axis=-1) * inv_sum[..., None]  # (H, W, 3)

    # interpolate attributes (from the prebaked per-meshlet vertex pack)
    pos_v = packed[..., 0:3]  # (H, W, 3, 3) object space
    nrm_v = packed[..., 3:6]  # (H, W, 3, 3)
    uv_v = packed[..., 6:8]  # (H, W, 3, 2)
    normal_obj = jnp.einsum("hwk,hwki->hwi", bary, nrm_v)
    uv = jnp.einsum("hwk,hwki->hwi", bary, uv_v)
    pos_obj = jnp.einsum("hwk,hwki->hwi", bary, pos_v)

    inst = vm_instance[vm_slot]
    world = entity_world[gscene.inst_entity[inst]]  # (H, W, 4, 4)
    world_pos = jnp.einsum("hwij,hwj->hwi", world[..., :3, :3], pos_obj) + world[..., :3, 3]
    # normal: inverse-transpose ≈ rotation part for rigid+uniform scale
    world_nrm = jnp.einsum("hwij,hwj->hwi", world[..., :3, :3], normal_obj)
    world_nrm = world_nrm / jnp.maximum(jnp.linalg.norm(world_nrm, axis=-1, keepdims=True), 1e-9)

    # per-triangle world tangent frame for normal mapping — the same edge/UV
    # algebra as setup3d.setup_triangles (the reference derives it per pixel
    # from screen-space derivatives, visbuffer_decode.slang:128-178; per-tri
    # algebra is that frame computed exactly)
    wv = jnp.einsum("hwij,hwkj->hwki", world[..., :3, :3], pos_v) + world[..., None, :3, 3]
    e1w = wv[..., 1, :] - wv[..., 0, :]
    e2w = wv[..., 2, :] - wv[..., 0, :]
    duv1 = uv_v[..., 1, :] - uv_v[..., 0, :]
    duv2 = uv_v[..., 2, :] - uv_v[..., 0, :]
    detuv = duv1[..., 0] * duv2[..., 1] - duv2[..., 0] * duv1[..., 1]
    t_raw = e1w * duv2[..., 1:2] - e2w * duv1[..., 1:2]
    b_raw = e2w * duv1[..., 0:1] - e1w * duv2[..., 0:1]
    sgn = jnp.where(detuv < 0.0, -1.0, 1.0)[..., None]
    t_len = jnp.linalg.norm(t_raw, axis=-1, keepdims=True)
    t_hat = sgn * t_raw / jnp.maximum(t_len, 1e-20)
    ng = jnp.cross(e1w, e2w)
    hand = jnp.sum(jnp.cross(ng, t_hat) * (b_raw * sgn), axis=-1, keepdims=True)
    w_hand = jnp.where(hand < 0.0, -1.0, 1.0)
    tan_ok = (jnp.abs(detuv)[..., None] > 1e-12) & (t_len > 1e-9)
    tangent_enc = jnp.where(tan_ok, t_hat * (0.75 + 0.25 * w_hand), 0.0)

    # material evaluation
    mat = gscene.inst_material[inst]  # (H, W)
    uv_t = uv * materials.uv_size[mat] + materials.uv_offset[mat]
    has_albedo = (materials.flags[mat] & 1).astype(jnp.bool_)
    texel = sample_atlas_bilinear(atlas, materials.albedo_rect[mat], uv_t, materials.sampling_mode[mat])
    texel = jnp.where(has_albedo[..., None], texel, 1.0)
    albedo = texel * materials.albedo_color[mat]
    has_emissive = (materials.flags[mat] & 4).astype(jnp.bool_)
    em_tex = sample_atlas_bilinear(atlas, materials.emissive_rect[mat], uv_t, materials.sampling_mode[mat])
    emissive = jnp.where(has_emissive[..., None], em_tex[..., :3], 1.0) * materials.emissive_color[mat]
    has_mr = (materials.flags[mat] & 8).astype(jnp.bool_)
    mr_tex = sample_atlas_bilinear(atlas, materials.mr_rect[mat], uv_t, materials.sampling_mode[mat])
    # glTF: metallic = B, roughness = G
    metallic = jnp.where(has_mr, mr_tex[..., 2], 1.0) * materials.metallic_factor[mat]
    roughness = jnp.where(has_mr, mr_tex[..., 1], 1.0) * materials.roughness_factor[mat]
    has_occ = (materials.flags[mat] & 16).astype(jnp.bool_)
    occ_tex = sample_atlas_bilinear(
        atlas, materials.occlusion_rect[mat], uv_t, materials.sampling_mode[mat]
    )
    occlusion = jnp.where(has_occ, occ_tex[..., 0], 1.0)

    # normal mapping (reference visbuffer_decode.slang:156-178; 3-component
    # +Y-up encoding — see ops/sampling.py::sample_material_textures)
    from .sampling import perturb_normal

    has_nrm = (materials.flags[mat] & 2).astype(jnp.bool_)
    nrm_tex = sample_atlas_bilinear(
        atlas, materials.normal_rect[mat], uv_t, materials.sampling_mode[mat]
    )
    nrm_ts = jnp.where(has_nrm[..., None], nrm_tex[..., :3] * 2.0 - 1.0,
                       jnp.array([0.0, 0.0, 1.0]))
    world_nrm = perturb_normal(world_nrm, tangent_enc, nrm_ts)

    hitf = hit[..., None]
    return {
        "hit": hit,
        "albedo": jnp.where(hitf, albedo, 0.0),
        "normal": jnp.where(hitf, world_nrm, 0.0),
        "emissive": jnp.where(hitf, emissive, 0.0),
        "metallic": jnp.where(hit, metallic, 0.0),
        "roughness": jnp.where(hit, roughness, 1.0),
        "occlusion": jnp.where(hit, occlusion, 1.0),
        "world_pos": jnp.where(hitf, world_pos, 0.0),
        "uv": uv,
        "tangent": jnp.where(hitf, tangent_enc, 0.0),
    }
