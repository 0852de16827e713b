"""Tests for geometry/lie_group.py (quaternion + Lie variants with
Jacobians — parity surface of /root/reference/ggrt/geometry/lie_group/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggrt_official_tpu.geometry import lie_group as lg
from ggrt_official_tpu.geometry.se3 import se3_exp, se3_log, so3_exp


def rand_w(key, n, scale=1.0):
    return jax.random.normal(key, (n, 3)) * scale


def rand_T(key, n):
    k1, k2 = jax.random.split(key)
    wu = jnp.concatenate([rand_w(k1, n), jax.random.normal(k2, (n, 3))], -1)
    return se3_exp(wu)


class TestQuaternion:
    def test_quat_matrix_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = lg.quat_normalize(jax.random.normal(key, (64, 4)))
        R = lg.quat_to_R(q)
        # orthonormality
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)),
            np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-6)
        q2 = lg.R_to_quat(R)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)

    def test_R_to_quat_all_pivots(self):
        # Rotations near pi about each axis exercise every Shepperd pivot.
        for axis in range(3):
            w = jnp.zeros(3).at[axis].set(3.14)
            R = so3_exp(w)
            q = lg.R_to_quat(R)
            np.testing.assert_allclose(
                np.asarray(lg.quat_to_R(q)), np.asarray(R), atol=1e-6)

    def test_quat_exp_matches_so3_exp(self):
        key = jax.random.PRNGKey(1)
        w = rand_w(key, 32, 2.0)
        R_q = lg.quat_to_R(lg.quat_exp(w))
        np.testing.assert_allclose(
            np.asarray(R_q), np.asarray(so3_exp(w)), atol=1e-5)

    def test_quat_log_roundtrip(self):
        key = jax.random.PRNGKey(2)
        # |w| must stay below pi: beyond it log returns the principal value.
        w = rand_w(key, 32, 0.6)
        np.testing.assert_allclose(
            np.asarray(lg.quat_log(lg.quat_exp(w))), np.asarray(w), atol=1e-5)

    def test_quat_exp_grad_at_zero(self):
        g = jax.jacobian(lg.quat_exp)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        # dq_vec/dw at 0 is I/2.
        np.testing.assert_allclose(np.asarray(g[1:]), np.eye(3) / 2, atol=1e-6)

    def test_quat_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(3)
        q = lg.quat_normalize(jax.random.normal(key, (8, 4)))
        v = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
        np.testing.assert_allclose(
            np.asarray(lg.quat_rotate(q, v)),
            np.asarray((lg.quat_to_R(q) @ v[..., None])[..., 0]), atol=1e-5)

    def test_quat_mul_conj(self):
        key = jax.random.PRNGKey(5)
        q = lg.quat_normalize(jax.random.normal(key, (8, 4)))
        ident = lg.quat_mul(q, lg.quat_conj(q))
        np.testing.assert_allclose(
            np.asarray(ident), np.broadcast_to([1, 0, 0, 0], (8, 4)), atol=1e-6)


class TestSE3Q:
    def test_matrix_roundtrip(self):
        T = rand_T(jax.random.PRNGKey(6), 16)
        v = lg.se3q_from_matrix(T)
        np.testing.assert_allclose(
            np.asarray(lg.se3q_to_matrix(v)), np.asarray(T), atol=1e-5)

    def test_mul_inv_transform(self):
        ka, kb, kp = jax.random.split(jax.random.PRNGKey(7), 3)
        Ta, Tb = rand_T(ka, 8), rand_T(kb, 8)
        va, vb = lg.se3q_from_matrix(Ta), lg.se3q_from_matrix(Tb)
        np.testing.assert_allclose(
            np.asarray(lg.se3q_to_matrix(lg.se3q_mul(va, vb))),
            np.asarray(Ta @ Tb), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(lg.se3q_to_matrix(lg.se3q_inv(va))),
            np.asarray(jnp.linalg.inv(Ta)), atol=1e-5)
        pts = jax.random.normal(kp, (8, 5, 3))
        ref = (Ta[:, None, :3, :3] @ pts[..., None])[..., 0] + Ta[:, None, :3, 3]
        np.testing.assert_allclose(
            np.asarray(lg.se3q_transform(va, pts)), np.asarray(ref), atol=1e-5)

    def test_exp_log(self):
        key = jax.random.PRNGKey(8)
        # rotation part below pi so log returns the same tangent back.
        wu = jax.random.normal(key, (16, 6)) * 0.5
        np.testing.assert_allclose(
            np.asarray(lg.se3q_log(lg.se3q_exp(wu))), np.asarray(wu), atol=1e-4)


class TestJacobians:
    def test_so3_left_jacobian_vs_ad(self):
        # exp(w + J_l(w)·δ) ≈ exp(δ)·exp(w): check via AD of the boxplus map
        # f(δ) = log(exp(δ) exp(w)); df/dδ|0 should equal J_l(w)^{-1}... the
        # cleaner identity: d/dδ [exp(J_l^{-1}... ] — instead verify
        # J_l(w) == d/dδ|0 of g(δ) = log-free: exp(w + δ) = exp(J_l δ') exp(w)
        # i.e. AD of h(d) = exp(w + d) vs exp(skew(J_l d)) exp(w) to 1st order.
        w = jnp.array([0.3, -0.7, 0.5])
        Jl = lg.so3_left_jacobian(w)
        eps = 1e-4
        for i in range(3):
            d = jnp.zeros(3).at[i].set(eps)
            lhs = so3_exp(w + d)
            rhs = so3_exp(Jl @ d) @ so3_exp(w)
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                       atol=5e-8 / eps * eps**2 + 1e-6)

    def test_so3_left_jacobian_small_angle(self):
        J = lg.so3_left_jacobian(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-7)
        g = jax.jacobian(lambda w: lg.so3_left_jacobian(w).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_boxplus(self):
        T = rand_T(jax.random.PRNGKey(9), 4)
        d = jax.random.normal(jax.random.PRNGKey(10), (4, 6)) * 0.1
        np.testing.assert_allclose(
            np.asarray(lg.boxplus_left(T, d)), np.asarray(se3_exp(d) @ T),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lg.boxplus_right(T, d)), np.asarray(T @ se3_exp(d)),
            atol=1e-6)

    def test_adjoint_identity(self):
        # Ad_T relates right and left perturbations: T·exp(δ) = exp(Ad_T δ)·T.
        T = rand_T(jax.random.PRNGKey(11), 1)[0]
        d = jnp.array([0.01, -0.02, 0.015, 0.03, -0.01, 0.02])
        lhs = T @ se3_exp(d)
        rhs = se3_exp(lg.se3_adjoint(T) @ d) @ T
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_jacob_expeD_de_vs_ad(self):
        D = rand_T(jax.random.PRNGKey(12), 1)[0]

        def f(eps):
            return (se3_exp(eps) @ D)[:3, :4].reshape(12)

        J_ad = jax.jacobian(f)(jnp.zeros(6))
        np.testing.assert_allclose(
            np.asarray(lg.jacob_expeD_de(D)), np.asarray(J_ad), atol=1e-5)

    def test_jacob_Dexpe_de_vs_ad(self):
        D = rand_T(jax.random.PRNGKey(13), 1)[0]

        def f(eps):
            return (D @ se3_exp(eps))[:3, :4].reshape(12)

        J_ad = jax.jacobian(f)(jnp.zeros(6))
        np.testing.assert_allclose(
            np.asarray(lg.jacob_Dexpe_de(D)), np.asarray(J_ad), atol=1e-5)
