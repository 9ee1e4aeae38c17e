"""The jit'd frame step: one `Scene::runtime_update` as a pure function.

Composes the reference's flecs pipeline phases (`/root/reference/Oxylus/src/Scene/
Scene.cpp:1139-1256`, systems registered `:432-1038`) into a single traced function:

  OnUpdate  — fixed-60Hz physics accumulator → N substeps (`physics_step`, `:720-729`),
              body→component pose sync (`rigidbody_update`, `:731-751`),
              per-frame pose interpolation into transforms (`physics_interpolate`, `:753-768`)
  PostUpdate — particle systems, sprite animation (`:988-1037`),
              batched world-matrix propagation (replaces observer-driven dirty tracking)

Everything below runs on device under one `jax.jit`; the host loop only feeds `dt`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..physics.state import BODY_STATIC, PhysicsParams, PhysicsState
from ..physics.step import physics_substep
from ..utils import math3d
from .state import SceneSpec, SceneState, propagate_transforms


def sync_bodies_to_components(state: SceneState, ps: PhysicsState) -> SceneState:
    """`rigidbody_update`: copy body pose into RigidBodyComponent keeping previous
    values (`Scene.cpp:731-751`). Scatter by owning entity index."""
    rb = dict(state.comp["RigidBodyComponent"])
    has_ent = (ps.entity >= 0) & ps.active & (ps.body_type != BODY_STATIC)
    n = state.alive.shape[0]
    # out-of-range target → dropped; one body per entity → unique permutation scatter
    target = jnp.where(has_ent, ps.entity, n)

    def scatter(dst: jax.Array, src: jax.Array) -> jax.Array:
        return dst.at[target].set(src, mode="drop", unique_indices=True)

    rb["previous_translation"] = scatter(rb["previous_translation"], ps.prev_pos)
    rb["previous_rotation"] = scatter(rb["previous_rotation"], ps.prev_quat)
    rb["translation"] = scatter(rb["translation"], ps.pos)
    rb["rotation"] = scatter(rb["rotation"], ps.quat)
    comp = dict(state.comp)
    comp["RigidBodyComponent"] = rb
    return dataclasses.replace(state, comp=comp)


def physics_interpolate(state: SceneState, ps: PhysicsState, alpha) -> SceneState:
    """`physics_interpolate` (`Scene.cpp:753-768`): every frame, blend body pose into
    TransformComponent by the accumulator alpha. Bodies with the interpolation flag
    lerp/slerp previous→current; others snap to current."""
    rb = state.comp["RigidBodyComponent"]
    mask = state.mask["RigidBodyComponent"] & state.alive
    interp = rb["interpolation"]

    pos_lerp = rb["previous_translation"] + (rb["translation"] - rb["previous_translation"]) * alpha
    rot_slerp = math3d.quat_slerp(rb["previous_rotation"], rb["rotation"], alpha)
    new_pos = jnp.where(interp[:, None], pos_lerp, rb["translation"])
    new_rot = jnp.where(interp[:, None], rot_slerp, rb["rotation"])

    t = dict(state.comp["TransformComponent"])
    t["position"] = jnp.where(mask[:, None], new_pos, t["position"])
    t["rotation"] = jnp.where(mask[:, None], new_rot, t["rotation"])
    comp = dict(state.comp)
    comp["TransformComponent"] = t
    return dataclasses.replace(state, comp=comp)


def character_controller_update(state: SceneState, ps: PhysicsState, dt) -> PhysicsState:
    """`character_controller_update` (`Scene.cpp:770-789`): drive character capsules
    from CharacterControllerComponent input using the reference's ground/air
    accelerate-decelerate movement model; jump when grounded."""
    cc = state.comp["CharacterControllerComponent"]
    ent = jnp.maximum(ps.entity, 0)
    is_char = ps.is_character & ps.active

    g = lambda k: cc[k][ent]
    grounded = ps.ground_normal_y > 0.7  # ~45° max slope
    move = g("move_input")  # (B, 3) desired direction, magnitude ≤ 1 (xz plane)
    move_xz = move.at[:, 1].set(0.0)
    move_len = jnp.linalg.norm(move_xz, axis=-1, keepdims=True)
    move_dir = move_xz / jnp.maximum(move_len, 1e-6)
    moving = move_len[:, 0] > 1e-3

    max_speed = jnp.where(grounded, g("max_ground_speed"), g("max_air_speed"))
    accel = jnp.where(grounded, g("ground_acceleration"), g("air_acceleration"))
    decel = jnp.where(grounded, g("ground_deceleration"), g("air_deceleration"))

    v = ps.linvel
    v_xz = v.at[:, 1].set(0.0)
    desired = move_dir * (max_speed * jnp.minimum(move_len[:, 0], 1.0))[:, None]
    rate = jnp.where(moving, accel, decel)
    delta = desired - v_xz
    delta_len = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    step_len = jnp.minimum(delta_len, (rate * dt)[:, None])
    v_new_xz = v_xz + delta / jnp.maximum(delta_len, 1e-6) * step_len

    jumping = g("jump_input") & grounded
    v_y = jnp.where(jumping, g("jump_force"), v[:, 1])

    new_v = jnp.concatenate([v_new_xz[:, :1], v_y[:, None], v_new_xz[:, 2:3]], axis=-1)
    linvel = jnp.where(is_char[:, None], new_v, ps.linvel)
    return dataclasses.replace(ps, linvel=linvel)


def sync_characters_to_components(state: SceneState, ps: PhysicsState) -> SceneState:
    """Copy character body pose + grounding back into CharacterControllerComponent
    (the `previous_translation/translation` pose fields, `Components.hpp:389-392`)."""
    cc = dict(state.comp["CharacterControllerComponent"])
    n = state.alive.shape[0]
    is_char = ps.is_character & ps.active & (ps.entity >= 0)
    target = jnp.where(is_char, ps.entity, n)

    def scatter(dst, src):
        return dst.at[target].set(src, mode="drop", unique_indices=True)

    cc["previous_translation"] = scatter(cc["previous_translation"], ps.prev_pos)
    cc["translation"] = scatter(cc["translation"], ps.pos)
    cc["is_grounded"] = scatter(cc["is_grounded"], ps.ground_normal_y > 0.7)
    comp = dict(state.comp)
    comp["CharacterControllerComponent"] = cc

    # characters also drive their TransformComponent directly (with interpolation flag)
    mask = state.mask["CharacterControllerComponent"] & state.alive
    interp = cc["interpolation"]
    t = dict(comp["TransformComponent"])
    t["position"] = jnp.where(mask[:, None], cc["translation"], t["position"])
    comp["TransformComponent"] = t
    return dataclasses.replace(state, comp=comp)


def sprite_animation_update(state: SceneState, dt) -> SceneState:
    """`sprite_animation_update` (`Scene.cpp:988-1037`): advance animation clocks.
    The current frame's UV window is derived at render time from current_time."""
    sa = dict(state.comp["SpriteAnimationComponent"])
    mask = state.mask["SpriteAnimationComponent"] & state.alive
    fps = sa["fps"].astype(jnp.float32)
    num = jnp.maximum(sa["num_frames"].astype(jnp.float32), 1.0)
    duration = jnp.where(fps > 0.0, num / jnp.maximum(fps, 1e-6), 0.0)
    t = sa["current_time"] + dt
    looped = jnp.where((duration > 0.0) & sa["loop"], jnp.mod(t, duration), jnp.minimum(t, duration))
    sa["current_time"] = jnp.where(mask, looped, sa["current_time"])
    comp = dict(state.comp)
    comp["SpriteAnimationComponent"] = sa
    return dataclasses.replace(state, comp=comp)


def step_physics_accumulated(
    ps: PhysicsState, params: PhysicsParams, spec: SceneSpec, dt, substep_fn=None
) -> tuple[PhysicsState, jax.Array]:
    """Fixed-interval accumulator driving up to `max_substeps` 1/60s substeps per frame
    (flecs `interval(physics_interval)` timer semantics, `Scene.cpp:720-729`).
    Returns (state, alpha) where alpha is the interpolation fraction.
    `substep_fn` overrides the per-substep integrator (the fused 3D frame swaps
    in the Pallas mega-kernel on eligible scenes)."""
    h = spec.physics_interval
    acc = ps.accumulator + dt
    nsub = jnp.minimum(jnp.floor(acc / h).astype(jnp.int32), spec.max_substeps)
    sub = substep_fn or (lambda q: physics_substep(q, params, h))

    def body(i, p):
        return jax.lax.cond(i < nsub, sub, lambda q: q, p)

    ps = jax.lax.fori_loop(0, spec.max_substeps, body, ps)
    acc = acc - nsub.astype(jnp.float32) * h
    acc = jnp.minimum(acc, h)  # spiral-of-death clamp
    ps = dataclasses.replace(ps, accumulator=acc)
    alpha = jnp.clip(acc / h, 0.0, 1.0)
    return ps, alpha


@partial(
    jax.jit,
    static_argnames=("spec", "has_bodies", "physics_mega"),
    donate_argnums=(0, 1),
)
def frame_step(
    state: SceneState,
    ps: PhysicsState,
    params: PhysicsParams,
    dt: jax.Array,
    spec: SceneSpec,
    has_bodies: bool = True,
    physics_mega: bool = False,
) -> tuple[SceneState, PhysicsState]:
    """Advance the whole scene by one frame. Buffers are donated: the previous frame's
    state is consumed in place (the reference's double-buffered frame model).

    `has_bodies=False` (static, decided once per scene on the host) compiles the
    physics stage out entirely — a sprites-only scene otherwise pays ~8 ms/frame
    for the substep while-loop machinery over empty body arrays (trace)."""
    from .particles import particle_update  # local import to avoid cycle

    dt = jnp.asarray(dt, jnp.float32)

    # --- OnUpdate: physics
    if has_bodies:
        ps = character_controller_update(state, ps, dt)
        substep_fn = None
        if physics_mega:
            # Pallas mega-kernel substep (the throughput solver of bench.py):
            # ~50-70 µs/substep vs ~8 ms for the multi-kernel XLA chain on the
            # tunnel target. Eligibility (shape support, capacity alignment,
            # no compounds/characters) is decided by the caller.
            from ..physics.megakernel_compact import megakernel_substeps_compact

            substep_fn = lambda q: megakernel_substeps_compact(
                q, params, spec.physics_interval, n_substeps=1
            )
        ps, alpha = step_physics_accumulated(ps, params, spec, dt, substep_fn)
        state = sync_bodies_to_components(state, ps)
        state = sync_characters_to_components(state, ps)
        state = physics_interpolate(state, ps, alpha)

    # --- PostUpdate: simulation systems
    state = particle_update(state, spec, dt)
    state = sprite_animation_update(state, dt)

    # --- transform hierarchy → world matrices (+ previous roll)
    new_world = propagate_transforms(state, spec)
    state = dataclasses.replace(
        state,
        previous_world=state.world,
        world=new_world,
        time=state.time + dt,
        frame=state.frame + 1,
    )
    return state, ps
