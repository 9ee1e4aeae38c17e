"""G-buffer raster kernel vs the decode oracle (interpret mode).

The Pallas kernel interpolates world position / normal / uv and broadcasts
material constants via extra coefficient planes (ops/raster3d.py
pack_gbuffer_coeff_matrix); decode_visbuffer reconstructs the same quantities
per pixel with analytic barycentrics — the two must agree on covered pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.material import empty_gpu_materials
from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.decode3d import decode_visbuffer
from oxylus_tpu.ops.raster3d import (
    gbuffer_from_raster,
    pack_coeff_matrix,
    pack_gbuffer_coeff_matrix,
    rasterize_gbuffer_pallas,
    rasterize_reference,
)
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from oxylus_tpu.render.camera import camera_matrices
from oxylus_tpu.render.scene3d import upload_meshes
from tests.test_render3d import cube_mesh

from oxylus_tpu.assets.bake import bake_mesh

W, H = 128, 96


@pytest.fixture(scope="module")
def scene():
    cp, cn, cu, ci = cube_mesh()
    baked = bake_mesh(cp, cn, cu, ci)
    gscene = upload_meshes([baked], [(0, 0, 0)])
    world = jnp.eye(4)[None]
    cam = camera_matrices(
        position=jnp.array([0.6, 0.8, 3.0]), yaw=jnp.float32(-jnp.pi / 2),
        pitch=jnp.float32(-0.2), tilt=jnp.float32(0.0), fov_deg=jnp.float32(60.0),
        near=jnp.float32(0.1), far=jnp.float32(100.0), zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(0), aspect=jnp.float32(W / H),
    )
    vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, jnp.float32(55.0))
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=16)
    vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam.frustum_planes, cam.position, capacity=16
    )
    setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)
    tile_list, _ = bin_meshlets_to_tiles(setup, W, H, __import__("oxylus_tpu.ops.raster3d", fromlist=["TILE"]).TILE, 8)
    return gscene, world, setup, vm_inst, tile_list, cam


def test_gbuffer_matches_decode(scene):
    gscene, world, setup, vm_inst, tile_list, cam = scene
    mats = empty_gpu_materials(4)
    import dataclasses

    mats = dataclasses.replace(
        mats,
        albedo_color=mats.albedo_color.at[0].set(jnp.array([0.8, 0.4, 0.2, 1.0])),
        roughness_factor=mats.roughness_factor.at[0].set(0.3),
        metallic_factor=mats.metallic_factor.at[0].set(0.9),
    )
    atlas = jnp.zeros((16, 16, 4), jnp.uint8)

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
    cm_gb, attr_gb = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts
    )
    depth, vid, gb = rasterize_gbuffer_pallas(cm_gb, attr_gb, tile_list, W, H, interpret=True)
    got = gbuffer_from_raster(gb, vid, depth, jnp.linalg.inv(cam.view_projection))

    # oracle: reference raster (identical visbuffer) + analytic decode
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    d_ref, v_ref = rasterize_reference(cm, tile_list, W, H)
    np.testing.assert_array_equal(np.asarray(vid), np.asarray(v_ref))
    want = decode_visbuffer(
        v_ref, setup, vm_inst, gscene, world, mats, atlas, width=W, height=H
    )

    hit = np.asarray(got["hit"])
    assert hit.mean() > 0.05
    np.testing.assert_array_equal(hit, np.asarray(want["hit"]))
    for key, tol in (("world_pos", 5e-2), ("normal", 5e-2), ("uv", 5e-2)):
        a = np.asarray(got[key])[hit]
        b = np.asarray(want[key])[hit]
        assert np.abs(a - b).max() < tol, f"{key} max err {np.abs(a - b).max()}"
    # the kernel stores the G-buffer in bf16 (8-bit mantissa): constants match
    # to ~2^-8 relative
    np.testing.assert_allclose(
        np.asarray(got["albedo"])[hit],
        np.asarray(want["albedo"])[hit][:, :3],  # kernel emits RGB; decode RGBA
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["metallic"])[hit], np.asarray(want["metallic"])[hit], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["roughness"])[hit], np.asarray(want["roughness"])[hit], atol=5e-3
    )


def test_gbuffer_tile32_matches_oracle(scene):
    """tile=32 variant of the G-buffer raster (static `tile` arg, round 4):
    binning and raster at 32-px tiles must reproduce the reference raster's
    visbuffer exactly and the decode oracle's attributes within the bf16
    tolerances — the per-pixel math is tile-size-invariant (tile-local hi/lo
    coefficient splits change rounding by < 2^-16)."""
    gscene, world, setup, vm_inst, _tl64, cam = scene
    mats = empty_gpu_materials(4)
    atlas = jnp.zeros((16, 16, 4), jnp.uint8)
    tile_list32, _ = bin_meshlets_to_tiles(setup, W, H, 32, 16)

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
    cm_gb, attr_gb = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], mat_consts
    )
    depth, vid, gb = rasterize_gbuffer_pallas(
        cm_gb, attr_gb, tile_list32, W, H, interpret=True, tile=32
    )
    got = gbuffer_from_raster(gb, vid, depth, jnp.linalg.inv(cam.view_projection))

    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    d_ref, v_ref = rasterize_reference(cm, _tl64, W, H)
    np.testing.assert_array_equal(np.asarray(vid), np.asarray(v_ref))
    want = decode_visbuffer(
        v_ref, setup, vm_inst, gscene, world, mats, atlas, width=W, height=H
    )
    hit = np.asarray(got["hit"])
    assert hit.mean() > 0.05
    for key, tol in (("world_pos", 5e-2), ("normal", 5e-2), ("uv", 5e-2)):
        a = np.asarray(got[key])[hit]
        b = np.asarray(want[key])[hit]
        assert np.abs(a - b).max() < tol, f"{key} max err {np.abs(a - b).max()}"


def test_gbuffer_compacted_matches_sparse(scene):
    """Dense triangle compaction (compact_triangles — the reference's
    cull_triangles re-grouping, `CullGeometry.cpp:61-389`) must not change the
    rendered image: same depth everywhere, same attributes at hit pixels, and
    the per-slot packed_id table maps dense vids back to the sparse ids."""
    import dataclasses

    from oxylus_tpu.ops.setup3d import compact_triangles
    from oxylus_tpu.ops.raster3d import TILE

    gscene, world, setup, vm_inst, tile_list, cam = scene
    mats = empty_gpu_materials(4)
    mats = dataclasses.replace(
        mats,
        albedo_color=mats.albedo_color.at[0].set(jnp.array([0.7, 0.3, 0.1, 1.0])),
        metallic_factor=mats.metallic_factor.at[0].set(0.5),
    )
    consts_m = jnp.concatenate(
        [
            mats.albedo_color[:, :3],
            mats.metallic_factor[:, None],
            mats.roughness_factor[:, None],
            mats.emissive_color,
        ],
        axis=1,
    )
    mat_idx = gscene.inst_material[vm_inst]

    # sparse (meshlet-grouped) raster
    cm_s, at_s = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], consts_m[mat_idx]
    )
    d_s, v_s, gb_s = rasterize_gbuffer_pallas(cm_s, at_s, tile_list, W, H, interpret=True)

    # dense (triangle-compacted) raster
    dense = compact_triangles(setup, setup["tri_valid"], mat_idx, vm_inst)
    assert int(dense["count"]) == int(jnp.sum(setup["tri_valid"]))
    # groups are actually denser than the source meshlets: every full group is
    # 100% valid (the last may be partial)
    n_full = int(dense["count"]) // setup["tri_valid"].shape[1]
    assert np.asarray(dense["tri_valid"])[:n_full].all()
    cm_d, at_d = pack_gbuffer_coeff_matrix(
        dense["coeffs"], dense["attr_planes"], dense["tri_valid"],
        consts_m[dense["slot_material"]],
    )
    near_eo = jnp.flip(jax.lax.cummax(jnp.flip(dense["ml_near"])))
    tl_d, _ = bin_meshlets_to_tiles(dense, W, H, TILE, 8)
    d_d, v_d, gb_d = rasterize_gbuffer_pallas(
        cm_d, at_d, tl_d, W, H, ml_near=near_eo, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(d_d), np.asarray(d_s))
    hit_s = np.asarray(v_s) >= 0
    hit_d = np.asarray(v_d) >= 0
    np.testing.assert_array_equal(hit_d, hit_s)
    # attributes agree at hit pixels (ties on shared edges interpolate the
    # same values; bf16 storage bounds the comparison)
    a, b = np.asarray(gb_d, np.float32), np.asarray(gb_s, np.float32)
    assert np.abs(a[hit_s] - b[hit_s]).max() < 2e-2
    # dense vid → original packed id: resolves to the sparse vid at pixels
    # where a unique winner exists (>99% — depth ties may pick either slot)
    pid_tab = np.asarray(dense["packed_id"]).reshape(-1)
    flat = (np.asarray(v_d) >> 8) * 64 + (np.asarray(v_d) & 255)
    orig = pid_tab[np.clip(flat, 0, pid_tab.size - 1)]
    match = (orig[hit_s] == np.asarray(v_s)[hit_s]).mean()
    assert match > 0.99, f"packed_id remap match {match}"


def test_gbuffer_passthrough_matches_sparse(scene):
    """Passthrough grouping (`passthrough_groups` — the compaction-free raster
    path for dense primitive scenes, RenderSpec.compact_raster=False) must
    produce the same image as rastering the raw meshlet groups: identical
    depth/vid, identical attributes, and slot tables that resolve vids."""
    import dataclasses

    from oxylus_tpu.ops.setup3d import passthrough_groups
    from oxylus_tpu.ops.raster3d import TILE

    gscene, world, setup, vm_inst, tile_list, cam = scene
    mats = empty_gpu_materials(4)
    mats = dataclasses.replace(
        mats,
        albedo_color=mats.albedo_color.at[0].set(jnp.array([0.7, 0.3, 0.1, 1.0])),
    )
    consts_m = jnp.concatenate(
        [
            mats.albedo_color[:, :3],
            mats.metallic_factor[:, None],
            mats.roughness_factor[:, None],
            mats.emissive_color,
        ],
        axis=1,
    )
    mat_idx = gscene.inst_material[vm_inst]

    cm_s, at_s = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], consts_m[mat_idx]
    )
    d_s, v_s, gb_s = rasterize_gbuffer_pallas(cm_s, at_s, tile_list, W, H, interpret=True)

    dense = passthrough_groups(setup, setup["tri_valid"], mat_idx, vm_inst)
    assert int(dense["count"]) == int(jnp.sum(setup["tri_valid"]))
    cm_p, at_p = pack_gbuffer_coeff_matrix(
        dense["coeffs"], dense["attr_planes"], dense["tri_valid"],
        consts_m[dense["slot_material"]],
    )
    near_eo = jnp.flip(jax.lax.cummax(jnp.flip(dense["ml_near"])))
    tl_p, _ = bin_meshlets_to_tiles(dense, W, H, TILE, 8)
    d_p, v_p, gb_p = rasterize_gbuffer_pallas(
        cm_p, at_p, tl_p, W, H, ml_near=near_eo, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_s))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_s))
    hit = np.asarray(v_s) >= 0
    a, b = np.asarray(gb_p, np.float32), np.asarray(gb_s, np.float32)
    assert np.abs(a[hit] - b[hit]).max() < 2e-2
    # passthrough packed_id is identity at valid slots
    pid_tab = np.asarray(dense["packed_id"]).reshape(-1)
    flat = (np.asarray(v_p) >> 8) * 64 + (np.asarray(v_p) & 255)
    orig = pid_tab[np.clip(flat, 0, pid_tab.size - 1)]
    np.testing.assert_array_equal(orig[hit], np.asarray(v_s)[hit])


def test_tile_raster_matches_group_kernel(scene):
    """The per-tile triangle raster (bin_triangles_per_tile → pack_tile_blocks
    → rasterize_gbuffer_tiles — r5 redesign) must produce the same image as the
    group-hit kernel: identical depth, identical hit mask, same attributes, and
    per-(tile, entry) tables that resolve vids back to the sparse packed ids."""
    import dataclasses

    from oxylus_tpu.ops.raster3d import (
        TILE,
        pack_tile_blocks,
        rasterize_gbuffer_tiles,
    )
    from oxylus_tpu.ops.setup3d import bin_triangles_per_tile, passthrough_groups

    gscene, world, setup, vm_inst, tile_list, cam = scene
    mats = empty_gpu_materials(4)
    mats = dataclasses.replace(
        mats,
        albedo_color=mats.albedo_color.at[0].set(jnp.array([0.7, 0.3, 0.1, 1.0])),
        metallic_factor=mats.metallic_factor.at[0].set(0.5),
    )
    consts_m = jnp.concatenate(
        [
            mats.albedo_color[:, :3],
            mats.metallic_factor[:, None],
            mats.roughness_factor[:, None],
            mats.emissive_color,
        ],
        axis=1,
    )
    mat_idx = gscene.inst_material[vm_inst]

    # group-kernel reference image
    cm_s, at_s = pack_gbuffer_coeff_matrix(
        setup["coeffs"], setup["attr_planes"], setup["tri_valid"], consts_m[mat_idx]
    )
    d_s, v_s, gb_s = rasterize_gbuffer_pallas(cm_s, at_s, tile_list, W, H, interpret=True)

    # per-tile triangle path
    K2 = 128
    dense = passthrough_groups(setup, setup["tri_valid"], mat_idx, vm_inst)
    entries, cnts, ovf = bin_triangles_per_tile(dense, W, H, TILE, 8, K2)
    assert int(ovf) == 0
    assert int(jnp.sum(cnts)) >= int(jnp.sum(setup["tri_valid"]))  # tri-tile pairs
    blocks = pack_tile_blocks(dense, entries, consts_m[dense["slot_material"]])
    d_t, v_t, gb_t = rasterize_gbuffer_tiles(
        blocks, cnts, W, H, tile=TILE, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(d_t), np.asarray(d_s))
    hit_s = np.asarray(v_s) >= 0
    hit_t = np.asarray(v_t) >= 0
    np.testing.assert_array_equal(hit_t, hit_s)
    a, b = np.asarray(gb_t, np.float32), np.asarray(gb_s, np.float32)
    assert np.abs(a[hit_s] - b[hit_s]).max() < 2e-2
    # vid = (tile << 8) | entry → per-(tile, entry) packed-id table resolves
    # to the sparse vid at pixels with a unique winner (depth ties may differ)
    pid_tab = np.asarray(blocks["tables"][2])
    flat = (np.asarray(v_t) >> 8) * K2 + (np.asarray(v_t) & 255)
    orig = pid_tab[np.clip(flat, 0, pid_tab.size - 1)]
    match = (orig[hit_s] == np.asarray(v_s)[hit_s]).mean()
    assert match > 0.99, f"packed_id remap match {match}"
