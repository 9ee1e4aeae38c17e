import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.bake import bake_mesh, build_meshlets, weld_vertices
from oxylus_tpu.ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from oxylus_tpu.ops.raster3d import (
    pack_coeff_matrix,
    rasterize_pallas,
    rasterize_reference,
)
from oxylus_tpu.ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from oxylus_tpu.render.camera import camera_matrices
from oxylus_tpu.render.scene3d import upload_meshes

W, H = 64, 64


def cube_mesh(size=1.0):
    """Unit cube, CCW winding viewed from outside (glTF convention)."""
    s = size / 2
    verts = []
    faces = []
    # 6 faces, 4 verts each
    face_defs = [
        # normal, corners (CCW from outside)
        ((0, 0, 1), [(-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]),
        ((0, 0, -1), [(s, -s, -s), (-s, -s, -s), (-s, s, -s), (s, s, -s)]),
        ((1, 0, 0), [(s, -s, s), (s, -s, -s), (s, s, -s), (s, s, s)]),
        ((-1, 0, 0), [(-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s)]),
        ((0, 1, 0), [(-s, s, s), (s, s, s), (s, s, -s), (-s, s, -s)]),
        ((0, -1, 0), [(-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s)]),
    ]
    normals = []
    uvs = []
    for n, corners in face_defs:
        base = len(verts)
        verts.extend(corners)
        normals.extend([n] * 4)
        uvs.extend([(0, 0), (1, 0), (1, 1), (0, 1)])
        faces.extend([(base, base + 1, base + 2), (base, base + 2, base + 3)])
    return (
        np.asarray(verts, np.float32),
        np.asarray(normals, np.float32),
        np.asarray(uvs, np.float32),
        np.asarray(faces, np.uint32).reshape(-1),
    )


def look_down_z_camera(aspect=1.0, pos=(0.0, 0.0, 3.0), fov_deg=60.0):
    return camera_matrices(
        position=jnp.asarray(pos, jnp.float32),
        yaw=jnp.float32(-np.pi / 2),  # forward = -z
        pitch=jnp.float32(0.0),
        tilt=jnp.float32(0.0),
        fov_deg=jnp.float32(fov_deg),
        near=jnp.float32(0.1),
        far=jnp.float32(100.0),
        zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(0),
        aspect=jnp.float32(aspect),
    )


@pytest.fixture(scope="module")
def cube_setup():
    pos, nrm, uv, idx = cube_mesh()
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, 0, 0)])  # mesh 0, entity 0, material 0
    world = jnp.broadcast_to(jnp.eye(4), (4, 4, 4)).astype(jnp.float32)
    cam = look_down_z_camera()
    return baked, gscene, world, cam


def test_bake_cube(cube_setup):
    baked, *_ = cube_setup
    assert len(baked.lods) >= 1
    md = baked.lods[0].meshlets
    assert md.count == 1
    assert md.triangle_count[0] == 12
    assert md.vertex_count[0] == 24
    np.testing.assert_allclose(baked.aabb_min, [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(baked.aabb_max, [0.5, 0.5, 0.5])


def test_meshlet_limits():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    idx = rng.integers(0, 500, size=3000).astype(np.uint32)
    md = build_meshlets(pos, idx)
    assert (md.triangle_count <= 64).all()
    assert (md.vertex_count <= 64).all()
    assert md.triangle_count.sum() == 1000
    # all triangles preserved through the indirection (as a multiset; morton-reordered)
    recon = []
    for m in range(md.count):
        lt = md.local_triangles[md.triangle_offset[m] : md.triangle_offset[m] + md.triangle_count[m]]
        tris = md.indirect_vertices[md.vertex_offset[m] + lt.astype(np.int64)]
        recon.extend(map(tuple, np.sort(tris, axis=1)))
    original = list(map(tuple, np.sort(idx.reshape(-1, 3), axis=1)))
    assert sorted(recon) == sorted(original)


def test_cull_instances_visibility(cube_setup):
    baked, gscene, world, cam = cube_setup
    vis, lod = cull_instances(
        gscene, world, cam.frustum_planes, cam.position, jnp.float32(H / (2 * np.tan(np.radians(30)))),
    )
    assert bool(vis[0])
    # move the instance behind the camera
    world2 = world.at[0, 2, 3].set(50.0)
    vis2, _ = cull_instances(
        gscene, world2, cam.frustum_planes, cam.position, jnp.float32(100.0)
    )
    assert not bool(vis2[0])


def test_meshlet_expansion(cube_setup):
    baked, gscene, world, cam = cube_setup
    vis = jnp.asarray([True])
    lod = jnp.asarray([0])
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=16)
    assert int(valid.sum()) == 1
    assert int(inst[0]) == 0 and int(meshlet[0]) == 0


def render_cube(gscene, world, cam, frustum=True, cone=True):
    vis, lod = cull_instances(
        gscene, world, cam.frustum_planes, cam.position, jnp.float32(55.0), frustum_enabled=frustum
    )
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=16)
    vm_inst, vm_ml, vm_valid, count = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam.frustum_planes, cam.position,
        capacity=16, cone_enabled=cone, frustum_enabled=frustum,
    )
    setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)
    tile_list, overflow = bin_meshlets_to_tiles(setup, W, H, __import__("oxylus_tpu.ops.raster3d", fromlist=["TILE"]).TILE, 8)
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    depth, vid = rasterize_reference(cm, tile_list, W, H)
    return depth, vid, setup, vm_inst, vm_ml, vm_valid


def test_raster_cube_reference(cube_setup):
    baked, gscene, world, cam = cube_setup
    depth, vid, setup, *_ = render_cube(gscene, world, cam)
    depth = np.asarray(depth)
    vid = np.asarray(vid)
    # center pixel: front face of the cube at z=0.5, camera at z=3 → depth in (0,1)
    assert vid[H // 2, W // 2] >= 0
    assert 0.0 < depth[H // 2, W // 2] < 1.0
    # corners: background
    assert vid[1, 1] == -1
    assert depth[1, 1] == 0.0
    # roughly half the screen covered by the cube face (fov 60°, cube half-angle)
    frac = (vid >= 0).mean()
    assert 0.05 < frac < 0.6


def test_raster_depth_ordering(cube_setup):
    """Two cubes at different depths: nearer cube wins the depth test."""
    pos, nrm, uv, idx = cube_mesh()
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, 0, 0), (0, 1, 0)], max_instances=2)
    world = jnp.broadcast_to(jnp.eye(4), (4, 4, 4)).astype(jnp.float32)
    world = world.at[1, 2, 3].set(1.2)  # entity 1 nearer to camera (z=1.2 vs 0)
    cam = look_down_z_camera()
    depth, vid, setup, vm_inst, vm_ml, vm_valid = render_cube(gscene, world, cam)
    vid_c = int(np.asarray(vid)[H // 2, W // 2])
    assert vid_c >= 0
    vm_slot = vid_c >> 8
    inst = int(np.asarray(vm_inst)[vm_slot])
    assert int(np.asarray(gscene.inst_entity)[inst]) == 1  # nearer cube on top


def test_pallas_matches_reference(cube_setup):
    baked, gscene, world, cam = cube_setup
    vis, lod = cull_instances(gscene, world, cam.frustum_planes, cam.position, jnp.float32(55.0))
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=16)
    vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam.frustum_planes, cam.position, capacity=16
    )
    setup = setup_triangles(gscene, world, vm_inst, vm_ml, vm_valid, cam.view_projection, W, H)
    tile_list, _ = bin_meshlets_to_tiles(setup, W, H, __import__("oxylus_tpu.ops.raster3d", fromlist=["TILE"]).TILE, 8)
    cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
    d_ref, v_ref = rasterize_reference(cm, tile_list, W, H)
    d_pal, v_pal = rasterize_pallas(cm, tile_list, W, H, interpret=True)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pal))


def test_backface_culling_halves_triangles(cube_setup):
    baked, gscene, world, cam = cube_setup
    _, _, setup, *_ = render_cube(gscene, world, cam)
    n_valid = int(np.asarray(setup["tri_valid"]).sum())
    # 12 triangles; at most 6-8 front-facing from this viewpoint (3 faces visible max,
    # axis-on view shows exactly 1 face = 2 triangles... front view shows face +z: 2 tris
    # plus silhouette-grazing faces culled)
    assert 1 <= n_valid <= 6


def test_cone_culling_rejects_back_meshlet():
    # single triangle facing +z; camera behind it (looking at its back) → cone-culled
    pos = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    uv = np.zeros((3, 2), np.float32)
    idx = np.arange(3, dtype=np.uint32)
    baked = bake_mesh(pos, nrm, uv, idx)
    gscene = upload_meshes([baked], [(0, 0, 0)])
    world = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).astype(jnp.float32)
    cam_front = look_down_z_camera(pos=(0.0, 0.0, 3.0))

    vis = jnp.asarray([True])
    lod = jnp.asarray([0])
    inst, meshlet, valid = expand_meshlet_instances(gscene, vis, lod, capacity=4)
    _, _, vm_valid_f, count_f = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam_front.frustum_planes, cam_front.position, capacity=4
    )
    assert int(count_f) == 1  # facing the camera → kept

    # camera on the -z side looking at the back face
    cam_back = camera_matrices(
        position=jnp.array([0.0, 0.0, -3.0]),
        yaw=jnp.float32(np.pi / 2),  # forward = +z
        pitch=jnp.float32(0.0),
        tilt=jnp.float32(0.0),
        fov_deg=jnp.float32(60.0),
        near=jnp.float32(0.1),
        far=jnp.float32(100.0),
        zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(0),
        aspect=jnp.float32(1.0),
    )
    _, _, _, count_b = cull_meshlets(
        gscene, world, inst, meshlet, valid, cam_back.frustum_planes, cam_back.position, capacity=4
    )
    assert int(count_b) == 0  # back side → cone-culled
