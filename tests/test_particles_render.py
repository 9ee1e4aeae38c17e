import jax.numpy as jnp
import numpy as np

from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.render.renderer2d import default_bindings, render_2d_with_particles
from oxylus_tpu.scene.frame import frame_step
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from tests.test_render2d import _ortho_cam, H, W


def test_particles_draw_over_sprites():
    spec = SceneSpec(max_entities=16, max_particles=128)
    s = Scene("p2d", spec=spec)
    emitter = s.create_entity("emitter")
    emitter.add("TransformComponent", position=(0.0, 0.0, 0.0))
    emitter.add(
        "ParticleSystemComponent",
        rate_over_time=200,
        start_lifetime=2.0,
        start_velocity=(0.0, 0.0, 0.0),
        start_size=(0.4, 0.4, 0.4, 1.0),
        start_color=(1.0, 0.2, 0.1, 1.0),
        position_start=(-0.1, 0.0, 0.0),
        position_end=(0.1, 0.0, 0.0),
        gravity_modifier=0.0,
    )
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(30):
        state, ps = frame_step(state, ps, params, 1 / 60, s.spec)
    assert int(jnp.sum(state.particles.alive)) > 20

    bindings = default_bindings(s.spec.padded_entities())
    color, vis = render_2d_with_particles(
        state, _ortho_cam(), bindings, width=W, height=H
    )
    c = np.asarray(color)
    # particles tinted red-ish near center
    center = c[H // 2 - 4 : H // 2 + 4, W // 2 - 8 : W // 2 + 8]
    assert center[..., 3].max() > 0.5
    assert center[..., 0].max() > center[..., 2].max()  # red > blue


def test_color_over_lifetime_applied():
    spec = SceneSpec(max_entities=16, max_particles=64)
    s = Scene("p2", spec=spec)
    e = s.create_entity("em")
    e.add("TransformComponent")
    e.add(
        "ParticleSystemComponent",
        rate_over_time=50,
        start_lifetime=1.0,
        start_color=(1.0, 1.0, 1.0, 1.0),
        color_over_lifetime_enabled=True,
        color_over_lifetime_start=(1.0, 0.0, 0.0, 1.0),
        color_over_lifetime_end=(0.0, 0.0, 1.0, 1.0),
        start_velocity=(0.0, 0.0, 0.0),
    )
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for _ in range(45):  # 0.75 s
        state, ps = frame_step(state, ps, params, 1 / 60, s.spec)

    from oxylus_tpu.render.renderer2d import particle_render_data

    world, color, alive, _ = particle_render_data(state)
    colors = np.asarray(color)[np.asarray(alive)]
    ages = np.asarray(state.particles.age)[np.asarray(alive)]
    young = colors[ages < 0.2]
    old = colors[ages > 0.6]
    assert young[:, 0].mean() > young[:, 2].mean()  # young = red
    assert old[:, 2].mean() > old[:, 0].mean()      # old = blue


def test_particle_bursts_and_rate_over_distance():
    """Burst emission at loop start + rate-over-distance when the emitter moves
    (`Scene.cpp:793-857`; bursts use loop-start semantics — the reference's own
    burst trigger compares burst_time to itself)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from oxylus_tpu.scene.particles import particle_update
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec

    spec = SceneSpec(max_entities=16, max_particles=512)
    s = Scene("burst", spec=spec)
    e = s.create_entity("em")
    e.add("TransformComponent", position=(0.0, 0.0, 0.0))
    e.add(
        "ParticleSystemComponent",
        rate_over_time=0, burst_count=25, rate_over_distance=7,
        looping=True, duration=0.5, start_lifetime=10.0,
    )
    state = s.to_device_state()
    dt = jnp.float32(1 / 60)

    # first frame crosses the loop start → one burst of 25
    state = particle_update(state, spec, dt)
    assert int(jnp.sum(state.particles.alive)) == 25

    # run just under one loop more: no new burst (rate_over_time is 0)
    for _ in range(28):
        state = particle_update(state, spec, dt)
    assert int(jnp.sum(state.particles.alive)) == 25

    # crossing the next loop boundary bursts again
    for _ in range(3):
        state = particle_update(state, spec, dt)
    assert int(jnp.sum(state.particles.alive)) == 50

    # move the emitter > 1 unit → rate_over_distance particles
    world = np.array(state.world)
    world[e.index, 0, 3] = 2.0
    state = dataclasses.replace(state, world=jnp.asarray(world))
    state = particle_update(state, spec, dt)
    assert int(jnp.sum(state.particles.alive)) == 57
    # moving again within 1 unit emits nothing
    world = np.array(world)
    world[e.index, 0, 3] = 2.3
    state = dataclasses.replace(state, world=jnp.asarray(world))
    state = particle_update(state, spec, dt)
    assert int(jnp.sum(state.particles.alive)) == 57


def test_particles_composite_in_3d_frame():
    """Forward2D-over-3D: billboards blend over the lit frame AFTER lighting and
    are depth-tested against opaque geometry (reference stage order,
    `RendererInstance.cpp:945-1088`; particles via the sprite queue `:1336-1395`).
    A red emitter in front of a wall must tint the frame; a green emitter
    behind the wall must be fully occluded."""
    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.render.renderer3d import RenderSpec
    from oxylus_tpu.runtime import SceneRunner
    from tests.test_render3d import cube_mesh

    spec = SceneSpec(max_entities=16, max_particles=64)
    s = Scene("p3d", spec=spec)
    cam = s.create_entity("camera")
    cam.add("TransformComponent", position=(0.0, 0.0, 10.0))
    cam.add("CameraComponent", fov=60.0)
    sun = s.create_entity("sun")
    sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
    sun.add("LightComponent", type="Directional", intensity=4.0)
    wall = s.create_entity("wall")
    wall.add("TransformComponent", position=(0.0, 0.0, 0.0), scale=(8.0, 8.0, 0.5))
    wall.add("MeshComponent", mesh_index=0)

    def emitter(name, pos, color):
        e = s.create_entity(name)
        e.add("TransformComponent", position=pos)
        e.add(
            "ParticleSystemComponent",
            rate_over_time=120,
            start_lifetime=5.0,
            start_velocity=(0.0, 0.0, 0.0),
            start_size=(0.6, 0.6, 0.6, 1.0),
            start_color=color,
            gravity_modifier=0.0,
        )
        return e

    emitter("front", (0.0, 0.0, 3.0), (4.0, 0.0, 0.0, 1.0))   # camera side
    emitter("behind", (0.0, 0.0, -3.0), (0.0, 4.0, 0.0, 1.0))  # occluded

    cp, cn, cu, ci = cube_mesh()
    runner = SceneRunner(
        s, width=96, height=64, render_mode="3d",
        meshes=[bake_mesh(cp, cn, cu, ci)],
        render_spec=RenderSpec(width=96, height=64, use_pallas=False),
    )
    assert runner._has_particles
    img = None
    for _ in range(8):
        img = runner.step()
    c = np.asarray(img)[..., :3]
    # red particles visible near image center (in front of the gray wall)
    center = c[24:40, 36:60]
    red_dom = (center[..., 0] > 0.25) & (center[..., 0] > center[..., 1] + center[..., 2])
    assert red_dom.any(), f"front particles missing (max {center.max(0).max(0)})"
    # green (behind the wall) must never show anywhere
    green_dom = (c[..., 1] > 0.25) & (c[..., 1] > c[..., 0] + c[..., 2])
    assert not green_dom.any(), "occluded particles leaked through the wall"
