"""Device-side scene state: the SoA pytree advanced by the jit'd frame step.

This is the TPU-native replacement for the reference's flecs world + GPU mirror slot-maps
(`/root/reference/Oxylus/include/Scene/Scene.hpp:59-222`): fixed-capacity component arrays
with validity masks plus an entity table (parent index, hierarchy level). Dirty-tracking
(`Scene.cpp:1507-1551`) disappears — world transforms are recomputed each step by a
level-ordered batched pass (`propagate_transforms`), which XLA fuses into the step.

Capacities and hierarchy depth are static (`SceneSpec`) so every jit trace has fixed
shapes; counts are carried as scalars inside the state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d
from . import components as C

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=["max_entities", "max_depth", "max_particles", "max_bodies", "max_contacts", "physics_interval", "max_substeps"])
@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Static shape/capacity configuration — hashable, safe to close over in jit.

    Defaults follow the reference's published capacities (`BASELINE.md`):
    1024 bodies (`Physics.hpp:20-22`), 60 Hz fixed tick (`Scene.hpp:66`).
    """

    max_entities: int = 1024
    max_depth: int = 8
    max_particles: int = 4096
    max_bodies: int = 1024
    max_contacts: int = 4096
    physics_interval: float = 1.0 / 60.0
    max_substeps: int = 4

    def padded_entities(self) -> int:
        return _round_up(max(self.max_entities, 8), 8)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["alive", "parent", "level", "world", "previous_world", "comp", "mask", "particles", "time", "frame"],
    meta_fields=[],
)
@dataclasses.dataclass
class SceneState:
    """The pytree advanced by `frame_step`.

    - `alive`:   (N,) bool — entity slot in use
    - `parent`:  (N,) i32  — parent entity index, -1 for roots
    - `level`:   (N,) i32  — hierarchy depth (0 = root), precomputed host-side
    - `world`/`previous_world`: (N, 4, 4) f32 — the GPU::Transforms mirror
      (`SceneGPU.hpp:15-18`)
    - `comp`:    {component: {field: (N, …)}} SoA arrays
    - `mask`:    {component: (N,) bool} presence masks
    - `time`, `frame`: scalars
    """

    alive: Array
    parent: Array
    level: Array
    world: Array
    previous_world: Array
    comp: dict[str, dict[str, Array]]
    mask: dict[str, Array]
    particles: Any  # ParticlePool (scene.particles) — Any avoids an import cycle
    time: Array
    frame: Array

    def count(self) -> Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def empty_state(spec: SceneSpec) -> SceneState:
    n = spec.padded_entities()
    comp: dict[str, dict[str, Array]] = {}
    mask: dict[str, Array] = {}
    for cdef in C.COMPONENTS:
        if cdef.name not in C.DEVICE_COMPONENTS or cdef.tag:
            continue
        fields = {}
        for f in cdef.fields:
            if f.kind == C.FieldKind.STRING:
                continue
            base = np.broadcast_to(f.default_array(), (n,) + f.shape)
            fields[f.name] = jnp.asarray(base)
        comp[cdef.name] = fields
        mask[cdef.name] = jnp.zeros((n,), jnp.bool_)
    from .particles import empty_pool

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, 4, 4))
    return SceneState(
        alive=jnp.zeros((n,), jnp.bool_),
        parent=jnp.full((n,), -1, jnp.int32),
        level=jnp.zeros((n,), jnp.int32),
        world=eye,
        previous_world=eye,
        comp=comp,
        mask=mask,
        particles=empty_pool(spec),
        time=jnp.zeros((), jnp.float32),
        frame=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Transform hierarchy
# ---------------------------------------------------------------------------

def local_matrices(state: SceneState) -> Array:
    t = state.comp["TransformComponent"]
    return math3d.trs_to_mat4(t["position"], t["rotation"], t["scale"])


def propagate_transforms(state: SceneState, spec: SceneSpec, local: Array | None = None) -> Array:
    """Batched parent-chain world-matrix recompute.

    Replaces the reference's recursive `Scene::set_dirty` walk
    (`src/Scene/Scene.cpp:1507-1551`) with `max_depth` masked batched 4×4 matmul sweeps:
    at sweep L every entity at hierarchy level L picks up its (already final) parent's
    world matrix. O(N · depth) fused work instead of pointer chasing.
    """
    if local is None:
        local = local_matrices(state)
    parent = jnp.maximum(state.parent, 0)  # roots gather themselves; masked out below
    world = local

    for lvl in range(1, spec.max_depth):
        parent_world = world[parent]
        composed = jnp.matmul(parent_world, local)
        world = jnp.where((state.level == lvl)[:, None, None], composed, world)
    return world


def refresh_world_transforms(state: SceneState, spec: SceneSpec) -> SceneState:
    """Recompute world matrices, rolling the previous-frame matrices
    (mirrors `previous_world = world` roll at `Scene.cpp:1241-1245`)."""
    new_world = propagate_transforms(state, spec)
    return dataclasses.replace(state, previous_world=state.world, world=new_world)


# ---------------------------------------------------------------------------
# Host → device
# ---------------------------------------------------------------------------

def compute_levels(parent: np.ndarray, alive: np.ndarray, max_depth: int) -> np.ndarray:
    """Host-side hierarchy level computation (re-run on reparent, which is rare)."""
    n = parent.shape[0]
    level = np.zeros(n, np.int32)
    for i in range(n):
        if not alive[i]:
            continue
        l, p = 0, parent[i]
        while p >= 0 and l < max_depth:
            l += 1
            p = parent[p]
        level[i] = l
    return level
