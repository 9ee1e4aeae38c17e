"""Normal mapping + full material texturing (round-4 VERDICT #6).

Validates the TPU-shaped texturing design against the reference semantics
(`/root/reference/Oxylus/src/Render/Shaders/passes/visbuffer_decode.slang:
123-193`): per-triangle tangent frames shipped through the attribute planes
(handedness in |T|), tangent-space normal perturbation, and the packed-row
multi-texture sampler used by the Pallas production path — checked against
the full-rate XLA decode oracle and analytic expectations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oxylus_tpu.assets.material import (
    ALPHA_MASK,
    Material,
    pack_materials,
)
from oxylus_tpu.ops.cull import cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.decode3d import decode_visbuffer
from oxylus_tpu.ops.raster3d import (
    gbuffer_from_raster,
    pack_coeff_matrix,
    pack_gbuffer_coeff_matrix,
    rasterize_reference,
)
from oxylus_tpu.ops.sampling import (
    pack_atlas_taps,
    pack_material_tables,
    perturb_normal,
    sample_material_textures,
)
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.render.scene3d import upload_meshes
from tests.test_render3d import look_down_z_camera
from tests.test_renderer3d_full import plane_mesh

W, H = 128, 128
A = 64  # atlas size


def _atlas_and_materials(mirror_u=False):
    """4-quadrant atlas: albedo checker / normal map / MR / emissive."""
    atlas = np.zeros((A, A, 4), np.uint8)
    # albedo (top-left 32x32): red-ish constant 200,80,40, alpha gradient in u
    atlas[0:32, 0:32] = (200, 80, 40, 255)
    # normal map (top-right): constant tilt toward +u: (0.6, 0.0, 0.8)
    nm = (np.array([0.6, 0.0, 0.8]) * 0.5 + 0.5) * 255.0
    atlas[0:32, 32:64, 0:3] = nm.astype(np.uint8)
    atlas[0:32, 32:64, 3] = 255
    # metallic-roughness (bottom-left): occlusion R=128, roughness G=64, metallic B=192
    atlas[32:64, 0:32] = (128, 64, 192, 255)
    # emissive (bottom-right): green
    atlas[32:64, 32:64] = (0, 255, 0, 255)

    rects = {
        "alb": (0.0, 0.0, 0.5, 0.5),
        "nrm": (0.5, 0.0, 1.0, 0.5),
        "mr": (0.0, 0.5, 0.5, 1.0),
        "em": (0.5, 0.5, 1.0, 1.0),
    }
    mat = Material(
        albedo_color=(1.0, 1.0, 1.0, 1.0),
        metallic_factor=1.0,
        roughness_factor=1.0,
        emissive_color=(2.0, 2.0, 2.0),
        albedo_texture="alb",
        normal_texture="nrm",
        metallic_roughness_texture="mr",
        occlusion_texture="mr",  # glTF shared-rect convention
        emissive_texture="em",
    )
    mats = pack_materials([mat], rects, 8)
    return jnp.asarray(atlas), mats


def _plane_world(mirror_u=False):
    pos, nrm, uv, idx = plane_mesh(size=4.0)
    if mirror_u:
        uv = uv.copy()
        uv[:, 0] = 1.0 - uv[:, 0]
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, 0, 0)], max_instances=2)
    world = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    # tilt the camera to look down at the +Y-up plane
    cam = look_down_z_camera(aspect=W / H, pos=(0.0, 3.0, 3.0))
    # pitch down 45°: rebuild via camera_matrices directly
    from oxylus_tpu.render.camera import camera_matrices

    cam = camera_matrices(
        position=jnp.array([0.0, 3.0, 3.0]),
        yaw=jnp.float32(-np.pi / 2),
        pitch=jnp.float32(-0.78),
        tilt=jnp.float32(0.0),
        fov_deg=jnp.float32(60.0),
        near=jnp.float32(0.1),
        far=jnp.float32(100.0),
        zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(0),
        aspect=jnp.float32(W / H),
    )
    return gscene, world, cam


def _render_decode(gscene, world, cam, mats, atlas):
    mi_inst, mi_ml, mi_valid, _ = expand_meshlet_instances(
        gscene, jnp.ones((2,), bool), jnp.zeros((2,), jnp.int32), 64,
        with_overflow=True,
    )
    vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
        gscene, world, mi_inst, mi_ml, mi_valid, cam.frustum_planes,
        cam.position, capacity=64, depth_sort=True,
    )
    setup = setup_triangles(
        gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H
    )
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    tile_list, _ = bin_meshlets_to_tiles(setup, W, H, 64, 16)
    depth, vid = rasterize_reference(cm, tile_list, W, H)
    gb = decode_visbuffer(
        vid, setup, vm_inst, gscene, world, mats, atlas, width=W, height=H
    )
    return gb, setup, vid, depth, vm_inst, tile_list


def test_decode_normal_mapping_analytic():
    """Flat +Y plane with identity UVs and a constant (0.6, 0, 0.8) normal map:
    T = +X·du-scale, B should complete the frame so the perturbed WORLD normal
    tilts toward the direction of increasing u (+X here)."""
    atlas, mats = _atlas_and_materials()
    gscene, world, cam = _plane_world()
    gb, *_ = _render_decode(gscene, world, cam, mats, atlas)
    hit = np.asarray(gb["hit"])
    assert hit.sum() > 500
    n = np.asarray(gb["normal"])[hit]
    # plane: u increases with +X, v increases with +Z; N = +Y.
    # T ≈ (1,0,0); B = w·(N×T); sampled (0.6, 0, 0.8) → n' ≈ 0.6·T + 0.8·N
    exp = np.array([0.6, 0.8, 0.0])
    med = np.median(n, axis=0)
    np.testing.assert_allclose(med, exp, atol=0.04)


def test_decode_mr_occlusion_emissive():
    atlas, mats = _atlas_and_materials()
    gscene, world, cam = _plane_world()
    gb, *_ = _render_decode(gscene, world, cam, mats, atlas)
    hit = np.asarray(gb["hit"])
    # metallic = B (192/255) × factor 1, roughness = G (64/255), occlusion = R (128/255)
    assert abs(np.median(np.asarray(gb["metallic"])[hit]) - 192 / 255) < 0.02
    assert abs(np.median(np.asarray(gb["roughness"])[hit]) - 64 / 255) < 0.02
    assert abs(np.median(np.asarray(gb["occlusion"])[hit]) - 128 / 255) < 0.02
    em = np.median(np.asarray(gb["emissive"])[hit], axis=0)
    np.testing.assert_allclose(em, [0.0, 2.0, 0.0], atol=0.03)


def test_mirrored_uv_handedness():
    """Mirroring U must flip the tangent-frame handedness (|T| encodes w=−1)
    and mirror the world-space direction of the sampled +u tilt."""
    atlas, mats = _atlas_and_materials()
    gscene, world, cam = _plane_world(mirror_u=True)
    gb, setup, *_ = _render_decode(gscene, world, cam, mats, atlas)
    hit = np.asarray(gb["hit"])
    t = np.asarray(gb["tangent"])[hit]
    tlen = np.linalg.norm(t, axis=-1)
    n = np.asarray(gb["normal"])[hit]
    med = np.median(n, axis=0)
    # u now increases with −X → the +u tilt points −X in world space
    np.testing.assert_allclose(med, [-0.6, 0.8, 0.0], atol=0.04)

    # handedness flips vs the unmirrored quad (|T| encodes it: 1 ↔ 0.5)
    gb0, *_ = _render_decode(*_plane_world(mirror_u=False)[:3], mats, atlas)
    hit0 = np.asarray(gb0["hit"])
    tlen0 = np.linalg.norm(np.asarray(gb0["tangent"])[hit0], axis=-1)
    m1, m0 = np.median(tlen), np.median(tlen0)
    assert {round(float(m1), 2), round(float(m0), 2)} == {0.5, 1.0}
    assert abs(m1 - m0) > 0.4  # mirroring flipped the encoded handedness


def test_production_sampler_matches_decode():
    """The Pallas-path texturing blocks (packed material rows + packed-tap
    sampler + perturb_normal on the raster's interpolated tangent) must match
    the XLA decode oracle at full rate on interior pixels."""
    atlas, mats = _atlas_and_materials()
    gscene, world, cam = _plane_world()
    gb, setup, vid, depth, vm_inst, tile_list = _render_decode(
        gscene, world, cam, mats, atlas
    )
    # production G-buffer raster (interpret mode → runs on CPU)
    mat_idx = gscene.inst_material[vm_inst]
    mat_consts = jnp.concatenate(
        [
            mats.albedo_color[mat_idx][:, :3],
            mats.metallic_factor[mat_idx][:, None],
            mats.roughness_factor[mat_idx][:, None],
            mats.emissive_color[mat_idx],
        ],
        axis=1,
    )
    cm6, attrB = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts
    )
    from oxylus_tpu.ops.raster3d import rasterize_gbuffer_pallas

    d2, v2, gb_img = rasterize_gbuffer_pallas(
        cm6, attrB, tile_list, W, H, interpret=True
    )
    gbp = gbuffer_from_raster(
        gb_img, v2, d2, jnp.linalg.inv(cam.view_projection)
    )
    # apply the production texture block at FULL rate (stride 1)
    vm_rows = pack_material_tables(mats)[gscene.inst_material[vm_inst]]
    vm_h = jnp.clip(jnp.maximum(v2, 0) // 256, 0, vm_inst.shape[0] - 1)
    tex = sample_material_textures(
        vm_rows[vm_h], pack_atlas_taps(atlas), A, gbp["uv"],
    )
    hitp = np.asarray(gbp["hit"]) & np.asarray(gb["hit"])
    alb = np.asarray(gbp["albedo"] * tex["albedo_rgb"])[hitp]
    np.testing.assert_allclose(
        alb, np.asarray(gb["albedo"])[hitp][..., :3], atol=0.02
    )
    mr = np.asarray(tex["mr"])[hitp]
    np.testing.assert_allclose(
        np.asarray(gbp["metallic"])[hitp] * mr[:, 0],
        np.asarray(gb["metallic"])[hitp], atol=0.02,
    )
    occ = np.asarray(tex["occlusion"])[hitp][:, 0]
    np.testing.assert_allclose(occ, np.asarray(gb["occlusion"])[hitp], atol=0.02)
    nperturbed = perturb_normal(
        gbp["normal"], gbp["tangent"],
        jnp.where(jnp.asarray(hitp)[..., None], tex["normal_ts"],
                  jnp.array([0.0, 0.0, 1.0])),
    )
    np.testing.assert_allclose(
        np.asarray(nperturbed)[hitp], np.asarray(gb["normal"])[hitp], atol=0.03
    )


def test_material_tables_pack_layout():
    atlas, mats = _atlas_and_materials()
    rows = np.asarray(pack_material_tables(mats))
    r = rows[0]
    assert r[8] == 1.0 and r[13] == 1.0 and r[18] == 1.0 and r[23] == 1.0
    assert r[24] == 1.0  # occlusion shares the MR rect
    np.testing.assert_allclose(r[4:8], [0.0, 0.0, 0.5, 0.5])
    np.testing.assert_allclose(r[9:13], [0.5, 0.0, 1.0, 0.5])
    # absent material slot: all flags zero
    assert rows[5][8] == 0.0 and rows[5][13] == 0.0


def test_alpha_mask_discard_in_3d_frame():
    """Alpha-cutoff discard on the production raster path (round-4 VERDICT
    missing #3; reference `visbuffer_encode.slang:60-64`): a masked quad in
    front of an opaque wall must show the quad where its albedo alpha passes
    the cutoff and the WALL (not a hole) where it is discarded."""
    import dataclasses as _dc

    from oxylus_tpu.core.config import RendererConfig
    from oxylus_tpu.render.renderer3d import RenderSpec, RendererInstance
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec
    from tests.test_render3d import cube_mesh

    A2 = 64
    atlas = np.zeros((A2, A2, 4), np.uint8)
    # masked albedo rect = whole atlas: red; alpha 255 on the left half of the
    # rect, 0 on the right (block-constant so half-res sampling is exact)
    atlas[:, :, 0] = 220
    atlas[:, :, 3] = 0
    atlas[:, : A2 // 2, 3] = 255
    rects = {"alb": (0.0, 0.0, 1.0, 1.0)}
    m_wall = Material(albedo_color=(0.1, 0.9, 0.1, 1.0))
    m_mask = Material(
        albedo_color=(1.0, 1.0, 1.0, 1.0),
        albedo_texture="alb",
        alpha_mode=ALPHA_MASK,
        alpha_cutoff=0.5,
    )
    mats = pack_materials([m_wall, m_mask], rects, 8)

    spec = SceneSpec(max_entities=8)
    s = Scene("amask", spec=spec)
    wall = s.create_entity("wall")
    wall.add("TransformComponent", position=(0.0, 0.0, -2.0), scale=(8.0, 8.0, 0.5))
    quad = s.create_entity("quad")
    quad.add("TransformComponent", position=(0.0, 0.0, 0.0), scale=(3.0, 3.0, 0.1))
    state = s.to_device_state()

    cp, cn, cu, ci = cube_mesh()
    baked = bake_mesh(cp, cn, cu, ci)
    gscene = upload_meshes(
        [baked, baked], [(0, wall.index, 0), (1, quad.index, 1)], max_instances=4
    )
    cam = look_down_z_camera(aspect=1.0, pos=(0.0, 0.0, 5.0))

    inst = RendererInstance(RenderSpec(
        width=W, height=H, max_visible_meshlets=64, gbuffer_interpret=True,
    ))
    cfg = _dc.replace(RendererConfig(), vbgtao_enable=False, bloom_enable=False)
    ctx = inst.render(
        state, gscene, cam, mats, jnp.asarray(atlas), cfg,
        textured=True, texture_features=("albedo",), alpha_masked=True,
    )
    alb = np.asarray(ctx["gbuffer"]["albedo"])[..., :3]
    vid = np.asarray(ctx["visbuffer"])

    # quad footprint ≈ center ±0.3·W (scale 3 at z=0, cam fov 60 at z=5)
    c = W // 2
    span = int(W * 0.23)
    red = (alb[..., 0] > 0.5) & (alb[..., 1] < 0.3)
    green = (alb[..., 1] > 0.5) & (alb[..., 0] < 0.3)
    inner = np.s_[c - span // 2 : c + span // 2, c - span // 2 : c + span // 2]
    # both the surviving quad half (red) and the discarded half showing the
    # wall (green) must be present inside the footprint — no holes
    assert red[inner].mean() > 0.25, f"masked quad missing ({red[inner].mean():.2f})"
    assert green[inner].mean() > 0.25, f"discard shows holes ({green[inner].mean():.2f})"
    assert (vid[inner] >= 0).all(), "discarded pixels must fall through to the wall"
