"""Shared scene builder for frame profiling scripts."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_runner(W, H, n_obj=200):
    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.render.renderer3d import RenderSpec
    from oxylus_tpu.render.sky import AtmosphereParams
    from oxylus_tpu.runtime import SceneRunner
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec
    from tests.test_render3d import cube_mesh
    from tests.test_native_bake import sphere_mesh

    spec = SceneSpec(max_entities=1024)
    s = Scene("prof", spec=spec)
    cam = s.create_entity("camera")
    cam.add("TransformComponent", position=(0.0, 8.0, 30.0))
    cam.add("CameraComponent", fov=60.0)
    s.set_field(cam.index, "CameraComponent", "pitch", -0.25)
    sun = s.create_entity("sun")
    sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
    sun.add("LightComponent", type="Directional", intensity=4.0)
    side = int(np.ceil(np.sqrt(n_obj)))
    for i in range(n_obj):
        e = s.create_entity(f"obj_{i}")
        e.add("TransformComponent", position=((i % side - side / 2) * 3.0, 0.0, (i // side - side / 2) * 3.0))
        e.add("MeshComponent", mesh_index=i % 2)
    cp, cn, cu, ci = cube_mesh()
    sp_, sn, su, si = sphere_mesh(16, 32)
    meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]
    return SceneRunner(
        s, width=W, height=H, render_mode="3d", meshes=meshes,
        render_spec=RenderSpec(width=W, height=H),
        atmosphere=AtmosphereParams(), enable_shadows=True,
    )
