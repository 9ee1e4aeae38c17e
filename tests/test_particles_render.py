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
