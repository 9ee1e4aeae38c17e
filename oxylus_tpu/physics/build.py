"""Host-side physics world construction from scene components.

Mirrors `Scene::physics_init` (`/root/reference/Oxylus/src/Scene/Scene.cpp:1040-1072`,
body construction `:1717-1850`): at runtime_start every entity carrying collider
components gets a body; RigidBodyComponent selects type/mass/material, colliders give
shape. Differences from the reference, by design:

- bodies are slots in fixed-capacity SoA arrays (`SceneSpec.max_bodies`, default the
  reference's MAX_BODIES = 1024, `Physics.hpp:20-22`), not Jolt heap objects;
- compound shapes: round 1 takes the first collider (compound support tracked);
- a collider without RigidBodyComponent becomes a static body, as in the reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .state import (
    BODY_DYNAMIC,
    BODY_KINEMATIC,
    BODY_STATIC,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    PhysicsState,
    box_inertia,
    capsule_inertia,
    empty_physics_state,
)

_COLLIDER_ORDER = (
    "BoxColliderComponent",
    "SphereColliderComponent",
    "CapsuleColliderComponent",
    "TaperedCapsuleColliderComponent",
    "CylinderColliderComponent",
)


def build_physics_state(scene) -> PhysicsState:
    spec = scene.spec
    ps = empty_physics_state(spec.max_bodies)

    host = {
        f.name: np.array(getattr(ps, f.name))  # np.array: writable host copy
        for f in dataclasses.fields(ps)
        if f.name != "accumulator"
    }

    slot = 0
    tc = scene._comp_data["TransformComponent"]
    rb_mask = scene._comp_mask["RigidBodyComponent"]
    rb = scene._comp_data["RigidBodyComponent"]
    cc_mask = scene._comp_mask["CharacterControllerComponent"]
    cc = scene._comp_data["CharacterControllerComponent"]

    n = scene._alive.shape[0]
    for i in range(n):
        if not scene._alive[i]:
            continue

        # character controllers get a dedicated upright dynamic capsule
        # (`Scene.cpp:1852-1886` creates a JPH::Character; here: locked-rotation body)
        if cc_mask[i]:
            if slot >= spec.max_bodies:
                break
            h = float(cc["character_height_standing"][i])
            r = float(cc["character_radius_standing"][i])
            mass = 70.0
            host["active"][slot] = True
            host["entity"][slot] = i
            host["body_type"][slot] = BODY_DYNAMIC
            host["shape_type"][slot] = SHAPE_CAPSULE
            host["pos"][slot] = tc["position"][i]
            host["quat"][slot] = [0.0, 0.0, 0.0, 1.0]
            host["prev_pos"][slot] = tc["position"][i]
            host["radius"][slot] = r
            host["half_length"][slot] = max(h / 2.0 - r, 0.01)
            host["inv_mass"][slot] = 1.0 / mass
            host["inv_inertia"][slot] = 0.0  # rotation locked
            host["dof_mask_ang"][slot] = 0.0
            host["friction"][slot] = 0.0  # movement handled by the controller
            host["is_character"][slot] = True
            slot += 1
            continue

        collider = None
        for cname in _COLLIDER_ORDER:
            if scene._comp_mask[cname][i]:
                collider = cname
                break
        if collider is None:
            continue
        if slot >= spec.max_bodies:
            break

        col = {k: v[i] for k, v in scene._comp_data[collider].items()}
        has_rb = bool(rb_mask[i])

        host["active"][slot] = True
        host["entity"][slot] = i
        host["pos"][slot] = tc["position"][i]
        host["quat"][slot] = tc["rotation"][i]
        host["prev_pos"][slot] = tc["position"][i]
        host["prev_quat"][slot] = tc["rotation"][i]
        host["offset"][slot] = col.get("offset", np.zeros(3))

        if collider == "BoxColliderComponent":
            host["shape_type"][slot] = SHAPE_BOX
            host["half_extent"][slot] = col["size"]
        else:
            host["shape_type"][slot] = SHAPE_CAPSULE
            if collider == "SphereColliderComponent":
                r, hl = float(col["radius"]), 0.0
            elif collider == "TaperedCapsuleColliderComponent":
                r = max(float(col["top_radius"]), float(col["bottom_radius"]))
                hl = float(col["height"]) / 2.0
            else:  # capsule / cylinder
                r, hl = float(col["radius"]), float(col["height"]) / 2.0
            host["radius"][slot] = r
            host["half_length"][slot] = hl

        col_friction = float(col.get("friction", 0.5))
        col_restitution = float(col.get("restitution", 0.0))

        if has_rb:
            btype = int(rb["type"][i])  # 0 static, 1 kinematic, 2 dynamic
            host["body_type"][slot] = btype
            mass = float(rb["mass"][i])
            if btype == BODY_DYNAMIC and mass > 0.0:
                host["inv_mass"][slot] = 1.0 / mass
                if collider == "BoxColliderComponent":
                    inertia = np.asarray(
                        box_inertia(jnp.float32(mass), jnp.asarray(col["size"], jnp.float32))
                    )
                else:
                    inertia = np.asarray(
                        capsule_inertia(
                            jnp.float32(mass),
                            jnp.float32(host["radius"][slot]),
                            jnp.float32(host["half_length"][slot]),
                        )
                    )
                host["inv_inertia"][slot] = 1.0 / np.maximum(inertia, 1e-12)
            # per-collider material wins, like the reference's body construction
            # (`Scene.cpp:1717-1850` builds Jolt shapes with collider materials)
            host["friction"][slot] = col_friction
            host["restitution"][slot] = col_restitution
            host["gravity_factor"][slot] = float(rb["gravity_factor"][i])
            host["linear_drag"][slot] = float(rb["linear_drag"][i])
            host["angular_drag"][slot] = float(rb["angular_drag"][i])
            host["is_sensor"][slot] = bool(rb["is_sensor"][i])
            dofs = int(rb["allowed_dofs"][i])
            host["dof_mask_lin"][slot] = [(dofs >> k) & 1 for k in range(3)]
            host["dof_mask_ang"][slot] = [(dofs >> k) & 1 for k in range(3, 6)]
        else:
            host["body_type"][slot] = BODY_STATIC
            host["friction"][slot] = col_friction
            host["restitution"][slot] = col_restitution

        slot += 1

    return PhysicsState(
        accumulator=jnp.zeros((), jnp.float32),
        **{k: jnp.asarray(v) for k, v in host.items()},
    )
