import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.assets.manager import AssetManager
from oxylus_tpu.core.project import Project, ProjectConfig
from oxylus_tpu.core.vfs import PROJECT_DIR, VFS
from oxylus_tpu.render.picking import cast_ray_bodies, pick_entity_2d, screen_ray
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.serialize import save_to_file
from oxylus_tpu.scene.state import SceneSpec


class TestProject:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ProjectConfig(name="Game", start_scene="scenes/main.json", asset_directory="Assets")
        proj = Project(cfg, directory=tmp_path)
        p = proj.save(tmp_path / "Game.oxproj")
        loaded = Project.load(p)
        assert loaded.config.name == "Game"
        assert loaded.config.start_scene == "scenes/main.json"
        assert loaded.directory == tmp_path

    def test_mount_and_start_scene(self, tmp_path):
        assets = tmp_path / "Assets" / "scenes"
        assets.mkdir(parents=True)
        s = Scene("main", spec=SceneSpec(max_entities=16))
        e = s.create_entity("hero")
        e.add("TransformComponent", position=(1.0, 2.0, 3.0))
        save_to_file(s, assets / "main.json")

        proj = Project(
            ProjectConfig(name="Game", start_scene="scenes/main.json"), directory=tmp_path
        )
        vfs = VFS()
        am = AssetManager()
        uuids = proj.mount(vfs, am)
        assert vfs.resolve_physical_dir(PROJECT_DIR) == tmp_path / "Assets"
        assert len(uuids) >= 1  # scene json imported

        loaded = proj.load_start_scene(spec=SceneSpec(max_entities=16))
        assert loaded.scene_name == "main"
        np.testing.assert_allclose(
            loaded.entity("hero").get("TransformComponent")["position"], [1.0, 2.0, 3.0]
        )


class TestPicking:
    def test_screen_ray_center_goes_forward(self):
        from tests.test_render3d import look_down_z_camera

        cam = look_down_z_camera()
        origin, direction = screen_ray(cam, 32, 32, 64, 64)
        d = np.asarray(direction)
        assert d[2] < -0.99  # looking down -z
        assert abs(float(origin[2]) - 3.0) < 0.2  # near plane by the camera

    def test_pick_entity_2d(self):
        vis = jnp.full((8, 8), -1, jnp.int32).at[3, 4].set(7)
        assert int(pick_entity_2d(vis, 4, 3)) == 7
        assert int(pick_entity_2d(vis, 0, 0)) == -1

    def test_cast_ray_hits_nearest_body(self):
        spec = SceneSpec(max_entities=16, max_bodies=16)
        s = Scene("ray", spec=spec)
        near = s.create_entity("near")
        near.add("TransformComponent", position=(0.0, 0.0, -5.0))
        near.add("SphereColliderComponent", radius=0.5)
        near.add("RigidBodyComponent")
        far = s.create_entity("far")
        far.add("TransformComponent", position=(0.0, 0.0, -10.0))
        far.add("SphereColliderComponent", radius=0.5)
        far.add("RigidBodyComponent")
        s.runtime_start()
        body, dist = cast_ray_bodies(
            s.physics_state, jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, -1.0])
        )
        assert int(s.physics_state.entity[int(body)]) == near.index
        assert 4.0 < float(dist) < 5.0

    def test_cast_ray_misses(self):
        spec = SceneSpec(max_entities=16, max_bodies=16)
        s = Scene("miss", spec=spec)
        e = s.create_entity("b")
        e.add("TransformComponent", position=(100.0, 0.0, 0.0))
        e.add("SphereColliderComponent")
        e.add("RigidBodyComponent")
        s.runtime_start()
        body, _ = cast_ray_bodies(
            s.physics_state, jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, -1.0])
        )
        assert int(body) == -1
