import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.physics.state import PhysicsParams
from oxylus_tpu.scene.frame import frame_step
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

DT = 1.0 / 60.0


def char_scene():
    spec = SceneSpec(max_entities=32, max_bodies=32)
    s = Scene("char", spec=spec)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(50.0, 1.0, 50.0), friction=0.8)
    hero = s.create_entity("hero")
    hero.add("TransformComponent", position=(0.0, 2.0, 0.0))
    hero.add("CharacterControllerComponent")
    return s, hero


def run_frames(s, n, set_input=None):
    s.runtime_start()
    state = s.to_device_state()
    ps = s.physics_state
    params = PhysicsParams()
    for i in range(n):
        if set_input is not None:
            state = set_input(state, i)
        state, ps = frame_step(state, ps, params, DT, s.spec)
    return state, ps


def test_character_lands_and_grounds():
    s, hero = char_scene()
    state, ps = run_frames(s, 120)
    cc = state.comp["CharacterControllerComponent"]
    y = float(cc["translation"][hero.index][1])
    # capsule: height 1.35, radius 0.3 → half_length 0.375; rest center ≈ 0.375+0.3 = 0.675
    assert 0.5 < y < 0.9
    assert bool(cc["is_grounded"][hero.index])
    # transform follows
    assert float(state.comp["TransformComponent"]["position"][hero.index][1]) == pytest.approx(y, abs=1e-4)


def test_character_walks():
    s, hero = char_scene()

    def push(state, i):
        import dataclasses

        cc = dict(state.comp["CharacterControllerComponent"])
        cc["move_input"] = cc["move_input"].at[hero.index].set(jnp.array([1.0, 0.0, 0.0]))
        comp = dict(state.comp)
        comp["CharacterControllerComponent"] = cc
        return dataclasses.replace(state, comp=comp)

    state, ps = run_frames(s, 180, push)
    x = float(state.comp["CharacterControllerComponent"]["translation"][hero.index][0])
    # max_ground_speed 7 m/s for ~2.5s (minus accel ramp + fall time) → well forward
    assert x > 5.0
    # speed capped at max_ground_speed
    body = int(np.nonzero(np.asarray(ps.is_character))[0][0])
    speed = float(jnp.linalg.norm(ps.linvel[body, [0, 2]]))
    assert speed <= 7.5


def test_character_jump():
    s, hero = char_scene()

    def jump_late(state, i):
        import dataclasses

        if i != 130:
            return state
        cc = dict(state.comp["CharacterControllerComponent"])
        cc["jump_input"] = cc["jump_input"].at[hero.index].set(True)
        comp = dict(state.comp)
        comp["CharacterControllerComponent"] = cc
        return dataclasses.replace(state, comp=comp)

    s2, hero2 = char_scene()
    state_rest, _ = run_frames(s2, 150)
    rest_y = float(state_rest.comp["CharacterControllerComponent"]["translation"][hero2.index][1])

    state, ps = run_frames(s, 150, jump_late)
    y = float(state.comp["CharacterControllerComponent"]["translation"][hero.index][1])
    assert y > rest_y + 0.5  # airborne ~0.33s after jump at 8 m/s
