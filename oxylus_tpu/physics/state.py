"""Batched rigid-body physics state.

TPU-native replacement for the per-scene `JPH::PhysicsSystem` the reference configures at
`/root/reference/Oxylus/src/Physics/Physics.cpp:100-115`. All bodies live in fixed-capacity
SoA arrays and advance together in one fused XLA step — no islands, no job graph.

Shape model (collider components, `Components.hpp:306-354`):
- box       → half extents (size field)
- sphere    → capsule with half_length 0
- capsule   → segment + radius (axis = local Y, like Jolt)
- cylinder  → approximated as a capsule of the same radius/height (round-1 narrowphase;
              exact cylinder support planned)
- tapered capsule → approximated as capsule with max radius
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# body_type codes (match RigidBodyComponent::BodyType order, `Components.hpp:269`)
BODY_STATIC = 0
BODY_KINEMATIC = 1
BODY_DYNAMIC = 2

# shape codes
SHAPE_BOX = 0
SHAPE_CAPSULE = 1   # sphere == capsule with half_length 0; tapered capsule uses
                    # radius (bottom) + radius2 (top) — the convex hull of the
                    # two end spheres (Jolt TaperedCapsuleShape semantics)
SHAPE_CYLINDER = 2  # flat-capped cylinder, axis local Y (Jolt CylinderShape)
SHAPE_MESH = 3      # static triangle mesh (Jolt MeshShape); geometry lives in the
                    # world-space triangle soup + uniform grid fields below, the
                    # body slot only carries material + identity


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gravity", "baumgarte", "penetration_slop", "speculative_margin", "restitution_threshold", "sleep_velocity", "sleep_time"],
    meta_fields=["velocity_iterations", "max_pairs", "points_per_pair", "comm", "allow_sleeping"],
)
@dataclasses.dataclass(frozen=True)
class PhysicsParams:
    """Solver configuration. Defaults follow Jolt's PhysicsSettings (the reference runs
    Jolt with defaults): Baumgarte 0.2, penetration slop 0.02, 10 velocity iterations;
    sleeping thresholds mirror Jolt's mPointVelocitySleepThreshold (0.03 m/s) /
    mTimeBeforeSleep (0.5 s) — the engine-side rule Jolt applies per island, applied
    here per body with contact-graph wake propagation.

    `comm` picks the contact↔body exchange strategy: "matmul" (one-hot incidence
    matmuls on the MXU — fastest single-world, memory ∝ P·B) or "scatter" (1-D
    gather + scatter-add — memory-light, preferred for large vmapped world batches)."""

    gravity: Array = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, -9.81, 0.0], jnp.float32)
    )
    baumgarte: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.2))
    penetration_slop: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.02))
    speculative_margin: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.02))
    restitution_threshold: Array = dataclasses.field(default_factory=lambda: jnp.float32(1.0))
    # Jolt's default point-velocity threshold is 0.03 m/s; the mass-splitting
    # Jacobi solver's residual stack jitter peaks right at that level, so the
    # default here is 0.05 to keep settled stacks from flapping at the boundary
    sleep_velocity: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.05))
    sleep_time: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.5))
    velocity_iterations: int = 10
    max_pairs: int = 4096
    points_per_pair: int = 4
    comm: str = "matmul"
    allow_sleeping: bool = True


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "active", "entity", "body_type", "shape_type",
        "pos", "quat", "linvel", "angvel",
        "prev_pos", "prev_quat",
        "inv_mass", "inv_inertia",
        "half_extent", "radius", "radius2", "half_length", "offset",
        "friction", "restitution", "gravity_factor",
        "linear_drag", "angular_drag", "dof_mask_lin", "dof_mask_ang", "is_sensor", "apply_gyro",
        "is_character", "ground_normal_y", "parent",
        "asleep", "sleep_timer",
        "accumulator",
        "mesh_tri", "mesh_grid", "mesh_grid_meta", "mesh_body",
    ],
    meta_fields=["has_proxies"],
)
@dataclasses.dataclass
class PhysicsState:
    # identity
    active: Array          # (B,) bool
    entity: Array          # (B,) i32 — owning entity slot, -1 if none
    body_type: Array       # (B,) i32
    shape_type: Array      # (B,) i32
    # pose & motion
    pos: Array             # (B, 3) f32
    quat: Array            # (B, 4) f32 xyzw
    linvel: Array          # (B, 3)
    angvel: Array          # (B, 3)
    prev_pos: Array        # (B, 3)  pose at previous fixed tick (for interpolation,
    prev_quat: Array       # (B, 4)  mirrors RigidBodyComponent previous_* fields)
    # mass
    inv_mass: Array        # (B,)
    inv_inertia: Array     # (B, 3) diagonal inverse inertia in body frame
    # shape
    half_extent: Array     # (B, 3) box half extents
    radius: Array          # (B,)   capsule/cylinder radius (tapered: bottom radius)
    radius2: Array         # (B,)   tapered-capsule top radius (== radius otherwise)
    half_length: Array     # (B,)   capsule half segment length (local Y)
    offset: Array          # (B, 3) collider local offset
    # material / flags
    friction: Array        # (B,)
    restitution: Array     # (B,)
    gravity_factor: Array  # (B,)
    linear_drag: Array     # (B,)
    angular_drag: Array    # (B,)
    dof_mask_lin: Array    # (B, 3) 1.0 where translation DOF allowed
    dof_mask_ang: Array    # (B, 3) 1.0 where rotation DOF allowed
    is_sensor: Array       # (B,) bool
    # gyroscopic integration (Jolt `Body::SetApplyGyroscopicForce`, exposed to
    # scripts at `/root/reference/Oxylus/src/Scripting/LuaPhysicsBindings.cpp:175`;
    # off by default exactly like Jolt's BodyCreationSettings)
    apply_gyro: Array      # (B,) bool
    is_character: Array    # (B,) bool — capsule driven by CharacterControllerComponent
    ground_normal_y: Array # (B,) f32 — support-normal y from last substep (grounding)
    # compound shapes: sub-collider slots are contact PROXIES of a root body —
    # geometry at `pos[parent] + R(quat[parent]) @ offset`, impulses applied to the
    # parent (the TPU-shaped replacement for Jolt compound shapes,
    # reference Scene.cpp:1717-1850 builds StaticCompoundShape)
    parent: Array          # (B,) i32 — root body slot, -1 for independent bodies
    # sleeping (Jolt island deactivation, per-body + contact-graph wake propagation)
    asleep: Array          # (B,) bool — body is deactivated; frozen, infinite-mass in contacts
    sleep_timer: Array     # (B,) f32 — seconds below the sleep velocity threshold
    # fixed-step accumulator (scalar)
    accumulator: Array
    # static mesh collider world (None when no MeshColliderComponent exists):
    # world-space triangle soup + a fixed XZ grid of per-cell triangle buckets
    # (the TPU-shaped replacement for Jolt MeshShape's BVH — fixed-capacity
    # lists, one gather per body instead of tree walks)
    mesh_tri: Array | None = None       # (T, 3, 3) f32 triangle vertices, CCW → outward normal
    mesh_grid: Array | None = None      # (GX*GZ, K_tri) i32 triangle index or -1
    mesh_grid_meta: Array | None = None # (5,) f32 [origin_x, origin_z, cell, gx, gz]
    mesh_body: Array | None = None      # () i32 — body slot carrying the mesh material
    has_proxies: bool = False  # static: any parent >= 0 (enables proxy sync paths)

    @property
    def num_slots(self) -> int:
        return self.active.shape[0]


def empty_physics_state(max_bodies: int) -> PhysicsState:
    b = max_bodies
    z3 = jnp.zeros((b, 3), jnp.float32)
    return PhysicsState(
        active=jnp.zeros((b,), jnp.bool_),
        entity=jnp.full((b,), -1, jnp.int32),
        body_type=jnp.zeros((b,), jnp.int32),
        shape_type=jnp.zeros((b,), jnp.int32),
        pos=z3,
        quat=jnp.zeros((b, 4), jnp.float32).at[:, 3].set(1.0),
        linvel=z3,
        angvel=z3,
        prev_pos=z3,
        prev_quat=jnp.zeros((b, 4), jnp.float32).at[:, 3].set(1.0),
        inv_mass=jnp.zeros((b,), jnp.float32),
        inv_inertia=z3,
        half_extent=z3,
        radius=jnp.zeros((b,), jnp.float32),
        radius2=jnp.zeros((b,), jnp.float32),
        half_length=jnp.zeros((b,), jnp.float32),
        offset=z3,
        friction=jnp.zeros((b,), jnp.float32),
        restitution=jnp.zeros((b,), jnp.float32),
        gravity_factor=jnp.ones((b,), jnp.float32),
        linear_drag=jnp.zeros((b,), jnp.float32),
        angular_drag=jnp.zeros((b,), jnp.float32),
        dof_mask_lin=jnp.ones((b, 3), jnp.float32),
        dof_mask_ang=jnp.ones((b, 3), jnp.float32),
        is_sensor=jnp.zeros((b,), jnp.bool_),
        apply_gyro=jnp.zeros((b,), jnp.bool_),
        is_character=jnp.zeros((b,), jnp.bool_),
        ground_normal_y=jnp.zeros((b,), jnp.float32),
        parent=jnp.full((b,), -1, jnp.int32),
        asleep=jnp.zeros((b,), jnp.bool_),
        sleep_timer=jnp.zeros((b,), jnp.float32),
        accumulator=jnp.zeros((), jnp.float32),
    )


def box_inertia(mass: Array, half: Array) -> Array:
    """Solid-box diagonal inertia: (1/3) m (h_j² + h_k²).

    Host-construction helpers (this and the two below) run in numpy: they are
    called per body during scene build, and an eager jnp dispatch per body is
    ~ms over the accelerator tunnel (minutes at 10k bodies)."""
    import numpy as np

    half = np.asarray(half)
    hx2, hy2, hz2 = half[..., 0] ** 2, half[..., 1] ** 2, half[..., 2] ** 2
    return (np.asarray(mass)[..., None] / 3.0) * np.stack(
        [hy2 + hz2, hx2 + hz2, hx2 + hy2], axis=-1
    )


def cylinder_inertia(mass: Array, radius: Array, half_length: Array) -> Array:
    """Solid cylinder, axis local Y: Iy = ½mr², Ix = Iz = m(3r² + h²)/12."""
    import numpy as np

    r, h = np.asarray(radius), np.asarray(half_length) * 2.0
    mass = np.asarray(mass)
    iy = 0.5 * mass * r**2
    ix = mass * (3.0 * r**2 + h**2) / 12.0
    return np.stack([ix, iy, ix], axis=-1)


def capsule_inertia(mass: Array, radius: Array, half_length: Array) -> Array:
    """Capsule (axis Y) inertia: cylinder + two hemispheres composite."""
    import numpy as np

    r, h = np.asarray(radius), np.asarray(half_length) * 2.0
    mass = np.asarray(mass)
    # volume split
    v_cyl = np.pi * r**2 * h
    v_sph = (4.0 / 3.0) * np.pi * r**3
    v_tot = np.maximum(v_cyl + v_sph, 1e-12)
    m_cyl = mass * v_cyl / v_tot
    m_sph = mass * v_sph / v_tot
    # cylinder about its center
    i_cyl_y = 0.5 * m_cyl * r**2
    i_cyl_x = m_cyl * (r**2 / 4.0 + h**2 / 12.0)
    # sphere split into two hemispheres at the ends (parallel-axis)
    i_sph_y = 0.4 * m_sph * r**2
    d = h / 2.0 + 3.0 * r / 8.0  # hemisphere COM offset from capsule center
    i_sph_x = 0.4 * m_sph * r**2 + m_sph * d**2
    ix = i_cyl_x + i_sph_x
    iy = i_cyl_y + i_sph_y
    return np.stack([ix, iy, ix], axis=-1)
