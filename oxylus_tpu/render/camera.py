"""Camera matrices from components.

Re-implements `Camera::update` (`/root/reference/Oxylus/src/Render/Camera.cpp:6-54`)
as a pure batched function: yaw/pitch spherical forward basis, lookAt RH view,
reversed-Z perspective (far/near swapped) or the fixed ±100 ortho for 2D, Vulkan Y-flip.
Previous-frame matrices are the caller's responsibility (kept in RenderPrep state).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import math3d

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["view", "projection", "position", "forward", "up", "right", "near", "far", "frustum_planes"],
    meta_fields=[],
)
@dataclasses.dataclass
class CameraMatrices:
    view: Array             # (4,4)
    projection: Array       # (4,4)
    position: Array         # (3,)
    forward: Array          # (3,)
    up: Array               # (3,)
    right: Array            # (3,)
    near: Array             # ()
    far: Array              # ()
    frustum_planes: Array   # (6,4)

    @property
    def view_projection(self) -> Array:
        return self.projection @ self.view


def camera_matrices(
    position: Array,
    yaw: Array,
    pitch: Array,
    tilt: Array,
    fov_deg: Array,
    near: Array,
    far: Array,
    zoom: Array,
    projection_kind: Array,  # 0 perspective, 1 orthographic
    aspect: Array,
) -> CameraMatrices:
    cos_pitch = jnp.cos(pitch)
    forward = jnp.stack([jnp.cos(yaw) * cos_pitch, jnp.sin(pitch), jnp.sin(yaw) * cos_pitch], axis=-1)
    forward = forward / jnp.maximum(jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-9)
    tilt_up = jnp.stack([tilt, jnp.ones_like(tilt), tilt], axis=-1)
    right = jnp.cross(forward, tilt_up)
    right = right / jnp.maximum(jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-9)
    up = jnp.cross(right, forward)
    up = up / jnp.maximum(jnp.linalg.norm(up, axis=-1, keepdims=True), 1e-9)

    view = math3d.look_at(position, position + forward, up)

    persp = math3d.perspective_reverse_z(jnp.radians(fov_deg), aspect, near, far)
    ortho = math3d.ortho_reverse_z(-aspect * zoom, aspect * zoom, -zoom, zoom, -100.0, 100.0)
    proj = jnp.where(projection_kind == 0, persp, ortho)

    vp = proj @ view
    planes = math3d.frustum_planes_from_mat(vp)
    return CameraMatrices(
        view=view,
        projection=proj,
        position=position,
        forward=forward,
        up=up,
        right=right,
        near=jnp.asarray(near, jnp.float32),
        far=jnp.asarray(far, jnp.float32),
        frustum_planes=planes,
    )


@partial(jax.jit, static_argnames=("entity_index",))
def camera_from_state(state, entity_index: int, aspect: Array) -> CameraMatrices:
    """Build matrices for the camera component on `entity_index` of a SceneState.
    Jitted (static entity index) — eager per-op dispatch over the accelerator
    tunnel costs ~1 ms/op, so even camera setup must be one compiled call."""
    cam = state.comp["CameraComponent"]
    t = state.comp["TransformComponent"]
    i = entity_index
    return camera_matrices(
        position=t["position"][i],
        yaw=cam["yaw"][i],
        pitch=cam["pitch"][i],
        tilt=cam["tilt"][i],
        fov_deg=cam["fov"][i],
        near=cam["near_clip"][i],
        far=cam["far_clip"][i],
        zoom=cam["zoom"][i],
        projection_kind=cam["projection"][i],
        aspect=aspect,
    )
