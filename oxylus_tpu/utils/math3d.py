"""Batched 3D math for the TPU-native engine.

All functions are pure jnp functions operating on batched arrays: every op accepts
arbitrary leading batch dimensions and keeps the component axis last. Conventions match
the reference engine (GLM / Vulkan):

- quaternions stored as (x, y, z, w) to match glm memory layout used by the reference
  serializer (`/root/reference/Oxylus/src/Scene/Components.cpp:30` binds x,y,z,w).
- matrices are row-major arrays applied as `M @ v` on column vectors, i.e. `mat[..., r, c]`.
- reversed-Z projection everywhere (near/far swapped), clip-space Y flip baked into the
  projection matrix — see `/root/reference/Oxylus/src/Render/Camera.cpp:35-53`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> Array:
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_normalize(q: Array, eps: float = 1e-12) -> Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product a*b, both (..., 4) xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector v (..., 3) by quaternion q (..., 4)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat3(q: Array) -> Array:
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat3_to_quat(m: Array) -> Array:
    """Robust rotation-matrix → quaternion (xyzw); branch-free 4-way select."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _q(tw, tx, ty, tz):
        return jnp.stack([tx, ty, tz, tw], axis=-1)

    # Four candidate reconstructions, pick numerically best.
    qw = _q(1 + tr, m21 - m12, m02 - m20, m10 - m01)
    qx = _q(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20)
    qy = _q(m02 - m20, m01 + m10, 1 + m11 - m00 - m22, m12 + m21)
    qz = _q(m10 - m01, m02 + m20, m12 + m21, 1 + m22 - m00 - m11)

    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cand = jnp.stack([c0, c1, c2, c3], axis=-1)
    idx = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_slerp(a: Array, b: Array, t: Array) -> Array:
    """Spherical lerp with shortest-path sign fix; falls back to nlerp near 0 angle."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0.0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-4
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < jnp.ndim(a) else t
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(wa * a + wb * b)


def quat_from_axis_angle(axis: Array, angle: Array) -> Array:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = jnp.asarray(angle) * 0.5
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None]], axis=-1)


def quat_integrate(q: Array, omega: Array, dt) -> Array:
    """Integrate orientation by angular velocity omega (rad/s, world frame) over dt.

    dq/dt = 0.5 * (omega_quat) * q  — exact-angle exponential map for stability.
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    # exp map: rotation of |omega|*dt around omega-hat
    half = 0.5 * angle * dt
    axis = omega / jnp.maximum(angle, 1e-12)
    s = jnp.sin(half)
    dq = jnp.concatenate([axis * s, jnp.cos(half)], axis=-1)
    return quat_normalize(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# Matrices
# ---------------------------------------------------------------------------

def mat4_identity(shape=()) -> Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), shape + (4, 4))


def trs_to_mat4(t: Array, r: Array, s: Array) -> Array:
    """translate * rotate * scale, the reference's local transform
    (`Components.hpp:16-18`). t,s: (...,3); r: (...,4) quat xyzw."""
    rot = quat_to_mat3(r)  # (...,3,3)
    m3 = rot * s[..., None, :]  # scale columns
    m = jnp.zeros(t.shape[:-1] + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(m3)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def mat4_mul(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b)


def mat4_transform_point(m: Array, p: Array) -> Array:
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def mat4_transform_dir(m: Array, d: Array) -> Array:
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)


def mat4_decompose(m: Array) -> tuple[Array, Array, Array]:
    """mat4 → (translation, quat, scale). Assumes no shear/negative scale."""
    t = m[..., :3, 3]
    basis = m[..., :3, :3]
    s = jnp.linalg.norm(basis, axis=-2)  # column norms
    rot = basis / jnp.maximum(s[..., None, :], 1e-12)
    q = mat3_to_quat(rot)
    return t, q, s


def look_at(eye: Array, center: Array, up: Array) -> Array:
    """Right-handed lookAt matching glm::lookAt (`Camera.cpp` uses lookAt RH)."""
    f = center - eye
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    s = jnp.cross(f, up)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
    u = jnp.cross(s, f)
    m = mat4_identity(eye.shape[:-1])
    m = m.at[..., 0, :3].set(s)
    m = m.at[..., 1, :3].set(u)
    m = m.at[..., 2, :3].set(-f)
    m = m.at[..., 0, 3].set(-jnp.sum(s * eye, axis=-1))
    m = m.at[..., 1, 3].set(-jnp.sum(u * eye, axis=-1))
    m = m.at[..., 2, 3].set(jnp.sum(f * eye, axis=-1))
    return m


def perspective_reverse_z(fov_y_rad, aspect, near, far) -> Array:
    """Reversed-Z perspective with Vulkan Y-flip, as the reference builds it:
    `glm::perspective(fov, aspect, far, near)` then `proj[1][1] *= -1`
    (`/root/reference/Oxylus/src/Render/Camera.cpp:35-53`). Depth: far→0, near→1."""
    fov_y_rad = jnp.asarray(fov_y_rad, jnp.float32)
    tan_half = jnp.tan(fov_y_rad / 2.0)
    # glm::perspectiveRH_ZO with zNear=far, zFar=near (swap → reversed-Z)
    z_near, z_far = far, near
    m = jnp.zeros(jnp.shape(fov_y_rad) + (4, 4), jnp.float32)
    m = m.at[..., 0, 0].set(1.0 / (aspect * tan_half))
    m = m.at[..., 1, 1].set(-(1.0 / tan_half))  # Vulkan Y flip
    m = m.at[..., 2, 2].set(z_far / (z_near - z_far))
    m = m.at[..., 2, 3].set(-(z_far * z_near) / (z_far - z_near))
    m = m.at[..., 3, 2].set(-1.0)
    return m


def ortho_reverse_z(left, right, bottom, top, near, far) -> Array:
    """Reversed-Z ortho with swapped planes + Y flip (`Camera.cpp:43-50`)."""
    z_near, z_far = far, near
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(-(2.0 / (top - bottom)))
    m = m.at[2, 2].set(-1.0 / (z_far - z_near))
    m = m.at[2, 3].set(-z_near / (z_far - z_near))
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set((top + bottom) / (top - bottom))  # sign folded with Y flip
    m = m.at[3, 3].set(1.0)
    return m


def mat4_inverse(m: Array) -> Array:
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# AABB / frustum
# ---------------------------------------------------------------------------

def aabb_union(min_a, max_a, min_b, max_b):
    return jnp.minimum(min_a, min_b), jnp.maximum(max_a, max_b)


def aabb_transform(m: Array, bmin: Array, bmax: Array) -> tuple[Array, Array]:
    """Transform an AABB by an affine matrix → world AABB (Arvo's method)."""
    center = (bmin + bmax) * 0.5
    extent = (bmax - bmin) * 0.5
    new_center = mat4_transform_point(m, center)
    abs_rot = jnp.abs(m[..., :3, :3])
    new_extent = jnp.einsum("...ij,...j->...i", abs_rot, extent)
    return new_center - new_extent, new_center + new_extent


def frustum_planes_from_mat(vp: Array) -> Array:
    """Extract 6 frustum planes (a,b,c,d), normalized, from a projection*view matrix.

    Rows trick, matching `Utils/OxMath.hpp:54` / `Shaders/cull.slang:57-85`.
    Returns (..., 6, 4); inside = dot(plane.xyz, p) + plane.w >= 0.
    """
    r0, r1, r2, r3 = vp[..., 0, :], vp[..., 1, :], vp[..., 2, :], vp[..., 3, :]
    planes = jnp.stack(
        [
            r3 + r0,  # left
            r3 - r0,  # right
            r3 + r1,  # bottom
            r3 - r1,  # top
            r2,       # near (reverse-Z: z >= 0)
            r3 - r2,  # far
        ],
        axis=-2,
    )
    n = jnp.linalg.norm(planes[..., :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, 1e-12)


def aabb_vs_frustum(planes: Array, bmin: Array, bmax: Array) -> Array:
    """Conservative AABB-in-frustum test. planes (...,6,4); bmin/bmax (...,3) → bool."""
    center = (bmin + bmax) * 0.5
    extent = (bmax - bmin) * 0.5
    # signed distance of center to plane + projected radius
    d = jnp.einsum("...pi,...i->...p", planes[..., :3], center) + planes[..., 3]
    r = jnp.einsum("...pi,...i->...p", jnp.abs(planes[..., :3]), extent)
    return jnp.all(d + r >= 0.0, axis=-1)


def srgb_to_linear(c: Array) -> Array:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def mat4_point_image(m, p):
    """Transform an image of 3-D points by a 4x4 matrix → (..., 4) clip coords,
    as fused elementwise linear combinations. The natural
    `einsum("ij,hwj->hwi", m, homogeneous(p))` compiles to a pathologically
    shaped (N, 4) @ (4, 4) matmul on TPU (~10 ms per use at 1080p); this form
    fuses into the surrounding elementwise kernel at bandwidth speed."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] for i in range(4)],
        axis=-1,
    )


def mat3_dir_image(m, d):
    """Rotate an image of 3-D vectors by a 3x3 matrix (fused lincomb form)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z for i in range(3)],
        axis=-1,
    )
