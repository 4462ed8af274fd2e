"""Lie algebra property tests (role of reference CostFunctionValidator for
the math substrate: analytic identities checked numerically)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.geometry import lie


def random_rotvecs(rng, n, scale=2.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale)


def test_hat_vee_roundtrip(rng):
    w = random_rotvecs(rng, 16)
    assert np.allclose(lie.vee(lie.hat(w)), w)


def test_expmap_logmap_roundtrip(rng):
    w = random_rotvecs(rng, 64, scale=0.8)
    q = lie.expmap(w)
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    assert np.allclose(lie.logmap(q), w, atol=1e-9)


def test_expmap_small_angle(rng):
    w = random_rotvecs(rng, 8, scale=1e-9)
    q = lie.expmap(w)
    assert np.allclose(q[:, 0], 1.0)
    assert np.allclose(q[:, 1:], 0.5 * w, atol=1e-15)
    assert np.allclose(lie.logmap(q), w, atol=1e-15)


def test_expmap_gradient_finite_at_zero():
    g = jax.jacfwd(lie.expmap)(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    # d exp / dw at 0 = [0; I/2]
    assert np.allclose(g[1:, :], 0.5 * np.eye(3), atol=1e-12)
    gl = jax.jacfwd(lie.logmap)(jnp.array([1.0, 0.0, 0.0, 0.0]))
    assert np.all(np.isfinite(gl))


def test_quat_rotate_matches_matrix(rng):
    w = random_rotvecs(rng, 32)
    v = jnp.asarray(rng.normal(size=(32, 3)))
    q = lie.expmap(w)
    R = lie.quat_to_mat(q)
    assert np.allclose(lie.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-10)


def test_quat_mul_matches_matrix_product(rng):
    q1 = lie.expmap(random_rotvecs(rng, 16))
    q2 = lie.expmap(random_rotvecs(rng, 16))
    R12 = lie.quat_to_mat(lie.quat_mul(q1, q2))
    assert np.allclose(R12, lie.quat_to_mat(q1) @ lie.quat_to_mat(q2), atol=1e-10)


def test_mat_to_quat_roundtrip(rng):
    q = lie.expmap(random_rotvecs(rng, 64))
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    q2 = lie.mat_to_quat(lie.quat_to_mat(q))
    assert np.allclose(q2, q, atol=1e-9)


def test_mat_to_quat_near_pi(rng):
    # rotations by ~pi exercise the non-trace Shepperd branches
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-6))
    R = lie.expmap_mat(w)
    q = lie.mat_to_quat(R)
    assert np.allclose(lie.quat_to_mat(q), R, atol=1e-7)


def test_right_jacobian_definition(rng):
    """Jr satisfies exp(w + dw) ~ exp(w) exp(Jr(w) dw)."""
    w = random_rotvecs(rng, 8, scale=1.5)
    dw = jnp.asarray(rng.normal(size=(8, 3)) * 1e-6)
    lhs = lie.expmap(w + dw)
    Jr = lie.right_jacobian(w)
    rhs = lie.quat_mul(lie.expmap(w), lie.expmap(jnp.einsum("nij,nj->ni", Jr, dw)))
    assert np.allclose(lhs, rhs, atol=1e-11)


def test_right_jacobian_inverse(rng):
    w = random_rotvecs(rng, 16, scale=2.0)
    J = lie.right_jacobian(w)
    Jinv = lie.right_jacobian_inv(w)
    eye = np.broadcast_to(np.eye(3), (16, 3, 3))
    assert np.allclose(J @ Jinv, eye, atol=1e-9)


def test_right_jacobian_small_angle():
    w = jnp.zeros((2, 3))
    assert np.allclose(lie.right_jacobian(w), np.broadcast_to(np.eye(3), (2, 3, 3)))
    assert np.allclose(lie.right_jacobian_inv(w), np.broadcast_to(np.eye(3), (2, 3, 3)))


def test_s2_tangential_basis(rng):
    x = rng.normal(size=(16, 3))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    x = jnp.asarray(x)
    B = lie.s2_tangential_basis(x)
    # columns orthonormal and orthogonal to x
    assert np.allclose(jnp.einsum("nij,nik->njk", B, B), np.broadcast_to(np.eye(2), (16, 2, 2)), atol=1e-12)
    assert np.allclose(jnp.einsum("ni,nij->nj", x, B), 0.0, atol=1e-12)
