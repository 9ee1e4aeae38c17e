import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.utils import math3d as m


def test_quat_identity_rotate():
    q = m.quat_identity((5,))
    v = jnp.array([[1.0, 2.0, 3.0]] * 5)
    np.testing.assert_allclose(m.quat_rotate(q, v), v, atol=1e-6)


def test_quat_mul_vs_matrix():
    rng = np.random.default_rng(0)
    a = m.quat_normalize(jnp.asarray(rng.normal(size=(16, 4)), jnp.float32))
    b = m.quat_normalize(jnp.asarray(rng.normal(size=(16, 4)), jnp.float32))
    ab = m.quat_mul(a, b)
    np.testing.assert_allclose(
        m.quat_to_mat3(ab), jnp.matmul(m.quat_to_mat3(a), m.quat_to_mat3(b)), atol=1e-5
    )


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(1)
    q = m.quat_normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
    q2 = m.mat3_to_quat(m.quat_to_mat3(q))
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_mat3():
    rng = np.random.default_rng(2)
    q = m.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(
        m.quat_rotate(q, v), jnp.einsum("bij,bj->bi", m.quat_to_mat3(q), v), atol=1e-5
    )


def test_quat_integrate_small_angle():
    q = m.quat_identity((1,))
    omega = jnp.array([[0.0, 0.0, jnp.pi]])  # pi rad/s around z
    q2 = m.quat_integrate(q, omega, 1.0)  # half turn
    v = m.quat_rotate(q2, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(v, [[-1.0, 0.0, 0.0]], atol=1e-5)


def test_trs_compose_decompose():
    t = jnp.array([[1.0, -2.0, 3.0]])
    r = m.quat_from_axis_angle(jnp.array([[0.0, 1.0, 0.0]]), jnp.array([0.7]))
    s = jnp.array([[2.0, 1.0, 0.5]])
    mat = m.trs_to_mat4(t, r, s)
    t2, r2, s2 = m.mat4_decompose(mat)
    np.testing.assert_allclose(t2, t, atol=1e-5)
    np.testing.assert_allclose(s2, s, atol=1e-5)
    assert abs(float(jnp.sum(r * r2))) > 1 - 1e-5


def test_trs_transform_point():
    t = jnp.array([[5.0, 0.0, 0.0]])
    r = m.quat_from_axis_angle(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([jnp.pi / 2]))
    s = jnp.array([[1.0, 1.0, 1.0]])
    mat = m.trs_to_mat4(t, r, s)
    p = m.mat4_transform_point(mat, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(p, [[5.0, 1.0, 0.0]], atol=1e-5)


def test_perspective_reverse_z():
    proj = m.perspective_reverse_z(jnp.radians(60.0), 16 / 9, 0.01, 1000.0)
    # near plane point maps to depth ~1, far plane to ~0 (reversed-Z)
    def depth_at(z):
        clip = proj @ jnp.array([0.0, 0.0, -z, 1.0])
        return float(clip[2] / clip[3])

    assert depth_at(0.01) == pytest.approx(1.0, abs=1e-4)
    assert depth_at(1000.0) == pytest.approx(0.0, abs=1e-4)


def test_frustum_culling():
    proj = m.perspective_reverse_z(jnp.radians(90.0), 1.0, 0.1, 100.0)
    view = m.look_at(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, -1.0]), jnp.array([0.0, 1.0, 0.0])
    )
    planes = m.frustum_planes_from_mat(proj @ view)
    inside = m.aabb_vs_frustum(planes, jnp.array([-1.0, -1.0, -11.0]), jnp.array([1.0, 1.0, -9.0]))
    behind = m.aabb_vs_frustum(planes, jnp.array([-1.0, -1.0, 9.0]), jnp.array([1.0, 1.0, 11.0]))
    off_side = m.aabb_vs_frustum(planes, jnp.array([50.0, -1.0, -11.0]), jnp.array([52.0, 1.0, -9.0]))
    assert bool(inside)
    assert not bool(behind)
    assert not bool(off_side)


def test_aabb_transform():
    mat = m.trs_to_mat4(
        jnp.array([10.0, 0.0, 0.0]),
        m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(jnp.pi / 2)),
        jnp.array([1.0, 1.0, 1.0]),
    )
    bmin, bmax = m.aabb_transform(mat, jnp.array([-1.0, -2.0, -3.0]), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(bmin, [8.0, -1.0, -3.0], atol=1e-5)
    np.testing.assert_allclose(bmax, [12.0, 1.0, 3.0], atol=1e-5)
