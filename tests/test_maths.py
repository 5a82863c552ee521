import jax.numpy as jnp
import numpy as np
import pytest

from substrata_tpu.maths import quat, transform


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(quat.normalize(jnp.asarray(q)))


def test_quat_identity_rotation():
    v = jnp.array([1.0, 2.0, 3.0])
    out = quat.rotate_vec(quat.IDENTITY, v)
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_quat_mul_matches_matrix():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rand_quat(rng))
    b = jnp.asarray(rand_quat(rng))
    ab = quat.mul(a, b)
    m = quat.to_matrix(a) @ quat.to_matrix(b)
    np.testing.assert_allclose(quat.to_matrix(ab), m, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rand_quat(rng, (8,)))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        quat.rotate_vec(q, v),
        jnp.einsum("nij,nj->ni", quat.to_matrix(q), v),
        atol=1e-5,
    )


def test_quat_from_matrix_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (16,))
    m = quat.to_matrix(jnp.asarray(q))
    q2 = np.asarray(quat.from_matrix(m))
    # Sign ambiguity: q and -q are the same rotation.
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_axis_angle_roundtrip():
    axis = jnp.array([0.0, 0.0, 1.0])
    q = quat.from_axis_angle(axis, jnp.float32(0.7))
    ax, ang = quat.to_axis_angle(q)
    np.testing.assert_allclose(ax, axis, atol=1e-5)
    np.testing.assert_allclose(ang, 0.7, atol=1e-5)


def test_integrate_small_rotation():
    omega = jnp.array([0.0, 0.0, 1.0])  # 1 rad/s about z
    q = quat.identity()
    for _ in range(100):
        q = quat.integrate(q, omega, 0.01)
    ax, ang = quat.to_axis_angle(q)
    np.testing.assert_allclose(float(ang), 1.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ax), [0, 0, 1], atol=1e-4)


def test_slerp_endpoints():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rand_quat(rng))
    b = jnp.asarray(rand_quat(rng))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(quat.slerp(a, b, 0.0)) * np.asarray(a))), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(quat.slerp(a, b, 1.0)) * np.asarray(b))), 1.0, atol=1e-5)


def test_trs_inverse():
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.normal(size=3).astype(np.float32))
    q = jnp.asarray(rand_quat(rng))
    scale = jnp.array([2.0, 0.5, 1.5])
    m = transform.trs_matrix(pos, q, scale)
    mi = transform.inverse_trs_matrix(pos, q, scale)
    np.testing.assert_allclose(np.asarray(m @ mi), np.eye(4), atol=1e-4)


def test_trs_zero_scale_clamped():
    pos = jnp.zeros(3)
    q = quat.identity()
    scale = jnp.array([1.0, 0.0, 1.0])
    mi = transform.inverse_trs_matrix(pos, q, scale)
    assert np.all(np.isfinite(np.asarray(mi)))


def test_inertia_formulas():
    # Box inertia of a cube with mass 1, half-extent 1: (2/3) on each axis.
    i = transform.box_inertia(jnp.array([1.0, 1.0, 1.0]), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(i), 2.0 / 3.0, atol=1e-6)
    i = transform.sphere_inertia(jnp.float32(1.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(i), 0.4, atol=1e-6)
