"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.parallel.sharding import (
    make_mesh,
    rasterize_tiles_sharded,
    replicate_worlds,
    worlds_reduce_mean,
    worlds_step,
)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    # Late in a monolithic full-suite run (~270 compiled graphs in-process)
    # the XLA:CPU compiler segfaulted inside backend_compile_and_load while
    # compiling this module's first 8-device shard_map program (reproduced
    # twice, r5; the module passes standalone). Dropping the live executable
    # caches before these compiles avoids the crash state.
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_worlds_parallel_physics(mesh):
    from oxylus_tpu.physics.state import PhysicsParams
    from oxylus_tpu.physics.step import physics_substep
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec

    s = Scene("w", spec=SceneSpec(max_entities=32, max_bodies=32))
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(20.0, 1.0, 20.0))
    ball = s.create_entity("ball")
    ball.add("TransformComponent", position=(0.0, 2.0, 0.0))
    ball.add("SphereColliderComponent", radius=0.5)
    ball.add("RigidBodyComponent")
    s.runtime_start()

    params = PhysicsParams(max_pairs=64)
    batched = replicate_worlds(s.physics_state, 8, mesh)
    step = worlds_step(lambda p: physics_substep(p, params, 1 / 60))
    for i in range(120):
        batched = step(batched)
        if i % 10 == 9:  # bound the async dispatch queue (frame-loop pacing)
            jax.block_until_ready(batched)
    ys = np.asarray(batched.pos[:, 1, 1])
    assert ys.shape == (8,)
    np.testing.assert_allclose(ys, ys[0])  # identical worlds stay identical
    assert abs(ys[0] - 0.5) < 0.06

    mean_y = worlds_reduce_mean(batched.pos[:, 1, 1])
    assert abs(float(mean_y) - ys[0]) < 1e-6


def test_tile_sharded_raster_matches_single_device(mesh):
    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.ops.cull import cull_meshlets, expand_meshlet_instances
    from oxylus_tpu.ops.raster3d import pack_coeff_matrix, rasterize_reference
    from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
    from oxylus_tpu.render.scene3d import upload_meshes
    from tests.test_render3d import cube_mesh, look_down_z_camera

    W, H = 128, 64
    pos, nrm, uv, idx = cube_mesh()
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, 0, 0)])
    world = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).astype(jnp.float32)
    cam = look_down_z_camera(aspect=W / H)

    vis = jnp.asarray([True])
    lod = jnp.asarray([0])
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=16)
    vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam.frustum_planes, cam.position, capacity=16
    )
    setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)
    tile_list, _ = bin_meshlets_to_tiles(setup, W, H, __import__("oxylus_tpu.ops.raster3d", fromlist=["TILE"]).TILE, 8)
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])

    d_single, v_single = rasterize_reference(cm, tile_list, W, H)
    d_shard, v_shard = rasterize_tiles_sharded(cm, tile_list, W, H, mesh)
    np.testing.assert_allclose(np.asarray(d_single), np.asarray(d_shard), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v_single), np.asarray(v_shard))


def test_full_frame_band_sharded_matches_single_device(mesh):
    """The widened sharded scope: raster → decode → PBR → exposure(psum) →
    tonemap → FXAA(ppermute halos) over 8 tile-row bands, bit-comparable to the
    single-device stage chain."""
    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.assets.material import empty_gpu_materials
    from oxylus_tpu.ops.cull import cull_meshlets, expand_meshlet_instances
    from oxylus_tpu.ops.decode3d import decode_visbuffer
    from oxylus_tpu.ops.raster3d import TILE, pack_coeff_matrix, rasterize_reference
    from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
    from oxylus_tpu.parallel.sharding import render_frame_sharded
    from oxylus_tpu.render.pbr import Lights, apply_pbr
    from oxylus_tpu.render.postfx import (
        adapt_exposure,
        apply_fxaa,
        apply_tonemap,
        luminance_histogram,
    )
    from oxylus_tpu.render.scene3d import upload_meshes
    from tests.test_render3d import cube_mesh, look_down_z_camera

    W, H = 128, 8 * TILE  # one tile row per device
    pos, nrm, uv, idx = cube_mesh()
    gscene = upload_meshes([bake_mesh(pos, nrm, uv, idx)], [(0, 0, 0)])
    world = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).astype(jnp.float32)
    cam = look_down_z_camera(aspect=W / H)

    inst, meshlet, valid = expand_meshlet_instances(
        gscene, jnp.asarray([True]), jnp.asarray([0]), capacity=16
    )
    vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam.frustum_planes, cam.position, capacity=16
    )
    setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)
    tile_list, _ = bin_meshlets_to_tiles(setup, W, H, TILE, 8)
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])

    mats = empty_gpu_materials(16)
    atlas = jnp.zeros((16, 16, 4), jnp.uint8)
    n1 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    lights = Lights(
        kind=jnp.zeros((4,), jnp.int32),
        color=jnp.ones((4, 3), jnp.float32),
        intensity=jnp.full((4,), 3.0, jnp.float32),
        position=jnp.zeros((4, 3), jnp.float32),
        direction=jnp.broadcast_to(-n1, (4, 3)),
        radius=jnp.ones((4,), jnp.float32),
        inner_cone=jnp.zeros((4,), jnp.float32),
        outer_cone=jnp.ones((4,), jnp.float32),
        valid=jnp.asarray([True, False, False, False]),
        count=jnp.int32(1),
    )
    ambient = jnp.full((3,), 0.1, jnp.float32)

    # single-device reference chain
    _, vid = rasterize_reference(cm, tile_list, W, H)
    gbuf = decode_visbuffer(
        vid, setup, vm_inst, gscene, world, mats, atlas, width=W, height=H
    )
    hdr = apply_pbr(gbuf, lights, cam.position, ambient)
    hist = luminance_histogram(hdr, jnp.float32(-11.5), jnp.float32(1.0 / 29.5))
    exposure, ref_lum = adapt_exposure(hist, jnp.float32(1.0), jnp.float32(1 / 60))
    ldr_ref = apply_fxaa(apply_tonemap(hdr, 1, exposure))

    ldr_sh, new_lum = render_frame_sharded(
        setup, cm, tile_list, vm_inst, gscene, world, mats, atlas,
        lights, cam.position, ambient, W, H, mesh,
        prev_luminance=1.0, dt=1 / 60, tonemapper=1,
    )
    assert ldr_sh.shape == (H, W, 3)
    np.testing.assert_allclose(float(new_lum), float(ref_lum), rtol=1e-6)
    # Numerical agreement bound (round-5 investigation): every stage of the
    # sharded chain is EXACT vs the single-device frame when run band-wise
    # outside shard_map on this CPU backend (raster vid/depth bitwise-equal;
    # band decode+PBR max diff 0.0 — see PARITY.md), but the CPU XLA backend
    # fuses/reassociates the shading FMA chains differently INSIDE a shard_map
    # body, leaving ≤5e-4 differences on ~0.3% of pixels near the lit cube's
    # edges. Assert tight agreement for the bulk plus a hard cap on the
    # fusion-reassociation residue.
    diff = np.abs(np.asarray(ldr_sh) - np.asarray(ldr_ref)).max(axis=-1)
    assert diff.max() < 1e-3, f"sharded frame diverges: max {diff.max():.2e}"
    frac_exact = float((diff <= 2e-5).mean())
    assert frac_exact > 0.99, f"only {frac_exact:.4f} of pixels within 2e-5"
    # the frame actually contains the lit cube (non-trivial coverage)
    assert float(jnp.mean((vid >= 0).astype(jnp.float32))) > 0.005


def test_worlds_sharded_megakernel_matches_single(mesh):
    """The throughput physics path (Pallas compact mega-kernel) sharded over the
    worlds mesh axis: per-world results must match the unsharded kernel bit-for-bit
    (each world is independent; the shard boundary must not perturb the math)."""
    from functools import partial

    from oxylus_tpu.physics.megakernel_compact import megakernel_substeps_compact
    from oxylus_tpu.physics.state import PhysicsParams
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec

    s = Scene("wmk", spec=SceneSpec(max_entities=512, max_bodies=256))
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(20.0, 1.0, 20.0), friction=0.5)
    rng = np.random.default_rng(2)
    for i in range(12):
        e = s.create_entity(f"b{i}")
        j = rng.uniform(-0.03, 0.03, 3)
        e.add("TransformComponent", position=(j[0], 1.0 + i * 1.1 + j[1], j[2]))
        e.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
        e.add("RigidBodyComponent", type="Dynamic", mass=1.0)
    s.runtime_start()

    params = PhysicsParams()
    kern = partial(
        megakernel_substeps_compact, params=params, dt=1 / 60,
        n_substeps=4, iterations=3, warm=0.7, geom_every=2, interpret=True,
    )

    single = jax.jit(lambda p: kern(p))(s.physics_state)

    batched = replicate_worlds(s.physics_state, 8, mesh)
    stepped = worlds_step(lambda p: kern(p))(batched)

    pos = np.asarray(stepped.pos)
    vel = np.asarray(stepped.linvel)
    for w in range(8):
        np.testing.assert_array_equal(pos[w], np.asarray(single.pos))
        np.testing.assert_array_equal(vel[w], np.asarray(single.linvel))
