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
