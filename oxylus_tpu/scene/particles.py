"""TPU-native particle system.

The reference pools particle *entities* per emitter and mutates them in two flecs
systems (`particle_system_update` emission `Scene.cpp:793-857`, `particle_update`
integration `:859-959`). Here the pool is a fixed-capacity SoA ring shared by the whole
scene: emitters claim contiguous ring slots via a prefix-sum over per-emitter spawn
counts (the masked-compaction idiom replacing the reference's pooled-entity reuse), and
integration is one fused vector pass. Color/size/rotation over lifetime are pure
functions of age and are evaluated at render time instead of being stored.

Randomness uses counter-based keys derived from (frame, slot): deterministic, replayable,
no host RNG state.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .state import SceneSpec, SceneState

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["alive", "emitter", "age", "lifetime", "pos", "vel", "cursor"],
    meta_fields=[],
)
@dataclasses.dataclass
class ParticlePool:
    alive: Array     # (M,) bool
    emitter: Array   # (M,) i32 entity index of owning ParticleSystemComponent
    age: Array       # (M,) f32 seconds since spawn
    lifetime: Array  # (M,) f32
    pos: Array       # (M,3)
    vel: Array       # (M,3)
    cursor: Array    # scalar i32 ring cursor


def empty_pool(spec: SceneSpec) -> ParticlePool:
    m = spec.max_particles
    return ParticlePool(
        alive=jnp.zeros((m,), jnp.bool_),
        emitter=jnp.full((m,), -1, jnp.int32),
        age=jnp.zeros((m,), jnp.float32),
        lifetime=jnp.zeros((m,), jnp.float32),
        pos=jnp.zeros((m, 3), jnp.float32),
        vel=jnp.zeros((m, 3), jnp.float32),
        cursor=jnp.zeros((), jnp.int32),
    )


# spawn budget per frame (static): plenty for the reference's default 10/s emitters
MAX_SPAWNS_PER_FRAME = 256


def particle_update(state: SceneState, spec: SceneSpec, dt) -> SceneState:
    pool = state.particles
    psys = dict(state.comp["ParticleSystemComponent"])
    emitter_mask = state.mask["ParticleSystemComponent"] & state.alive

    sim_dt = dt * psys["simulation_speed"]

    # --- emitter clocks -----------------------------------------------------
    playing = emitter_mask & psys["play_on_awake"]
    t_prev = psys["system_time"]
    t_new = jnp.where(playing, t_prev + sim_dt, t_prev)
    duration = jnp.maximum(psys["duration"], 1e-6)
    active_window = playing & (
        psys["looping"] | (t_new < duration + psys["start_delay"])
    )
    emitting = active_window & (t_new >= psys["start_delay"])

    # rate-over-time emission via integer crossings of the emission clock
    rate = psys["rate_over_time"].astype(jnp.float32)
    delay = psys["start_delay"]
    n_prev = jnp.floor((t_prev - delay) * rate)
    n_new = jnp.floor((t_new - delay) * rate)
    spawn_count = jnp.where(emitting, jnp.maximum(n_new - n_prev, 0.0), 0.0).astype(jnp.int32)

    # rate-over-distance (`Scene.cpp:845-849`): when the emitter has moved more
    # than 1 unit since the last distance spawn, emit rate_over_distance at once
    epos = state.world[:, :3, 3]
    lsp = psys["last_spawned_position"]
    moved = jnp.sum((epos - lsp) ** 2, axis=-1) > 1.0
    dist_emit = emitting & moved & (psys["rate_over_distance"] > 0)
    spawn_count = spawn_count + jnp.where(
        dist_emit, psys["rate_over_distance"].astype(jnp.int32), 0
    )
    psys["last_spawned_position"] = jnp.where(dist_emit[:, None], epos, lsp)

    # bursts: burst_count particles at the start of each emission loop. (The
    # reference's trigger `burst_time >= burst_time` at Scene.cpp:852 compares a
    # value to itself — i.e. every frame; bounded loop-start semantics chosen.)
    loops_prev = jnp.floor((t_prev - delay) / duration)
    loops_new = jnp.floor((t_new - delay) / duration)
    first_cross = (t_prev <= delay) & (t_new > delay)  # initial activation
    burst_events = jnp.where(
        active_window,
        jnp.maximum(loops_new - loops_prev, 0.0) + first_cross.astype(jnp.float32),
        0.0,
    ).astype(jnp.int32)
    spawn_count = spawn_count + psys["burst_count"].astype(jnp.int32) * burst_events

    spawn_count = jnp.minimum(spawn_count, MAX_SPAWNS_PER_FRAME)

    psys["system_time"] = t_new

    # --- allocate ring slots: prefix sum over emitters ----------------------
    prefix = jnp.cumsum(spawn_count)
    total = jnp.minimum(prefix[-1] if prefix.shape[0] > 0 else jnp.int32(0), MAX_SPAWNS_PER_FRAME)

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (MAX_SPAWNS_PER_FRAME, 1), 0)[:, 0]
    spawn_valid = s_idx < total
    emitter_of = jnp.searchsorted(prefix, s_idx, side="right").astype(jnp.int32)
    emitter_of = jnp.clip(emitter_of, 0, state.alive.shape[0] - 1)
    slot = jnp.mod(pool.cursor + s_idx, spec.max_particles)

    # spawn parameters gathered from the owning emitter
    g = lambda k: psys[k][emitter_of]
    world_off = state.world[emitter_of][:, :3, 3]  # emitter world position
    key = jax.random.fold_in(jax.random.PRNGKey(0x0C5), state.frame)
    u = jax.random.uniform(key, (MAX_SPAWNS_PER_FRAME, 1))
    spawn_pos = world_off + g("position_start") + (g("position_end") - g("position_start")) * u
    spawn_vel = g("start_velocity")
    spawn_life = g("start_lifetime")

    # ring slots are unique within one frame's spawn budget; invalid → dropped
    safe_slot = jnp.where(spawn_valid, slot, spec.max_particles)

    def scatter(dst, src, fill_mask):
        del fill_mask  # invalid rows are dropped by the out-of-range target
        return dst.at[safe_slot].set(src, mode="drop", unique_indices=True)

    new_pool = ParticlePool(
        alive=scatter(pool.alive, jnp.ones_like(spawn_valid), spawn_valid),
        emitter=scatter(pool.emitter, emitter_of, spawn_valid),
        age=scatter(pool.age, jnp.zeros((MAX_SPAWNS_PER_FRAME,), jnp.float32), spawn_valid),
        lifetime=scatter(pool.lifetime, spawn_life, spawn_valid),
        pos=scatter(pool.pos, spawn_pos, spawn_valid),
        vel=scatter(pool.vel, spawn_vel, spawn_valid),
        cursor=jnp.mod(pool.cursor + total, spec.max_particles),
    )

    # --- integrate live particles ------------------------------------------
    em = jnp.maximum(new_pool.emitter, 0)
    ge = lambda k: psys[k][em]
    age = new_pool.age + dt * ge("simulation_speed")
    alive = new_pool.alive & (age < new_pool.lifetime)
    frac = jnp.clip(age / jnp.maximum(new_pool.lifetime, 1e-6), 0.0, 1.0)

    gravity = jnp.array([0.0, -9.81, 0.0], jnp.float32)
    accel = gravity[None, :] * ge("gravity_modifier")[:, None]
    fol = jnp.where(
        ge("force_over_lifetime_enabled")[:, None],
        ge("force_over_lifetime_start")
        + (ge("force_over_lifetime_end") - ge("force_over_lifetime_start")) * frac[:, None],
        0.0,
    )
    vel = new_pool.vel + (accel + fol) * (dt * ge("simulation_speed"))[:, None]
    vol = jnp.where(
        ge("velocity_over_lifetime_enabled")[:, None],
        ge("velocity_over_lifetime_start")
        + (ge("velocity_over_lifetime_end") - ge("velocity_over_lifetime_start")) * frac[:, None],
        0.0,
    )
    pos = new_pool.pos + (vel + vol) * (dt * ge("simulation_speed"))[:, None]

    new_pool = dataclasses.replace(
        new_pool,
        age=jnp.where(new_pool.alive, age, new_pool.age),
        alive=alive,
        vel=jnp.where(alive[:, None], vel, new_pool.vel),
        pos=jnp.where(alive[:, None], pos, new_pool.pos),
    )

    comp = dict(state.comp)
    comp["ParticleSystemComponent"] = psys
    return dataclasses.replace(state, comp=comp, particles=new_pool)
