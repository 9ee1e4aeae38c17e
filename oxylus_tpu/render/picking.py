"""Screen-ray + visbuffer mouse picking (editor viewport support).

Reference: `Camera::get_screen_ray` (`/root/reference/Oxylus/src/Render/Camera.cpp:78+`)
and the editor's viewport picking, which reads the entity id from the 2D/3D id targets.
Here both styles exist:
- `screen_ray`: unproject a pixel into a world ray (for physics ray casts / gizmos);
- `pick_entity`: O(1) lookup in the id buffers the rasterizers already produce
  (2D path emits entity ids; 3D path's visbuffer resolves through the meshlet tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math3d

Array = jax.Array


def screen_ray(camera, x: float, y: float, width: int, height: int) -> tuple[Array, Array]:
    """Pixel → (origin, direction) world-space ray."""
    ndc_x = (x + 0.5) / width * 2.0 - 1.0
    ndc_y = (y + 0.5) / height * 2.0 - 1.0
    inv_vp = math3d.mat4_inverse(camera.view_projection)
    # reverse-Z: near plane at ndc z = 1
    near_h = inv_vp @ jnp.array([ndc_x, ndc_y, 1.0, 1.0])
    far_h = inv_vp @ jnp.array([ndc_x, ndc_y, 1e-4, 1.0])
    near = near_h[:3] / near_h[3]
    far = far_h[:3] / far_h[3]
    direction = far - near
    direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-9)
    return near, direction


def pick_entity_2d(visbuffer: Array, x: int, y: int) -> Array:
    """Entity id at a pixel of the 2D id buffer (-1 = none)."""
    h, w = visbuffer.shape
    xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.asarray(y, jnp.int32), 0, h - 1)
    return visbuffer[yi, xi]


def pick_entity_3d(
    visbuffer: Array, vm_instance: Array, gscene, x: int, y: int,
    slot_instance: Array | None = None,
    slot_group: int = 64,
) -> Array:
    """Entity id at a pixel of the 3D visbuffer: id → vm slot → instance → entity.
    `slot_instance` (VM·64,) resolves ids from the dense-compacted raster path
    (renderer ctx["slot_instance"]); without it ids are meshlet-relative."""
    h, w = visbuffer.shape
    xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.asarray(y, jnp.int32), 0, h - 1)
    pid = visbuffer[yi, xi]
    vm_slot = jnp.maximum(pid, 0) >> 8
    if slot_instance is not None:
        flat = jnp.clip(
            vm_slot * slot_group + (jnp.maximum(pid, 0) & 255), 0, slot_instance.shape[0] - 1
        )
        inst = slot_instance[flat]
    else:
        inst = vm_instance[vm_slot]
    entity = gscene.inst_entity[inst]
    return jnp.where(pid >= 0, entity, -1)


def cast_ray_bodies(ps, origin: Array, direction: Array, max_dist: float = 1000.0):
    """Physics ray cast against all body AABBs (`Scene::cast_ray` analog,
    `Scene.cpp:1323-1332` — the reference casts into the Jolt broadphase).
    Returns (body_index or -1, distance)."""
    from ..physics.step import shape_local_halfbox

    rot = math3d.quat_to_mat3(ps.quat)
    center = ps.pos + jnp.einsum("bij,bj->bi", rot, ps.offset)
    half = jnp.einsum("bij,bj->bi", jnp.abs(rot), shape_local_halfbox(ps))
    bmin = center - half
    bmax = center + half

    inv_d = 1.0 / jnp.where(jnp.abs(direction) > 1e-9, direction, 1e-9)
    t0 = (bmin - origin[None, :]) * inv_d[None, :]
    t1 = (bmax - origin[None, :]) * inv_d[None, :]
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & ps.active & (tmin < max_dist)
    dist = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    best = jnp.argmin(dist)
    found = jnp.isfinite(dist[best])
    return jnp.where(found, best, -1), jnp.where(found, dist[best], max_dist)
