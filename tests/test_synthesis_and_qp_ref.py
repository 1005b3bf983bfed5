"""Tests for dlqr/dlyap/c2d and the float64 interior-point QP oracle."""

import numpy as np
import pytest

from rtmpc_tpu.utils.synthesis import c2d, dlqr, dlyap
from rtmpc_tpu.utils.qp_ref import solve_qp_dense


def test_dlqr_double_integrator():
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    Q = np.eye(2)
    R = np.eye(1)
    K, S, eigs = dlqr(A, B, Q, R)
    # Riccati residual must vanish
    res = A.T @ S @ A - S - (A.T @ S @ B) @ np.linalg.solve(
        R + B.T @ S @ B, B.T @ S @ A) + Q
    np.testing.assert_allclose(res, 0, atol=1e-9)
    # closed loop stable
    assert np.max(np.abs(eigs)) < 1.0
    # independent oracle: Riccati value iteration to convergence
    S_vi = Q.copy()
    for _ in range(10000):
        K_vi = np.linalg.solve(R + B.T @ S_vi @ B, B.T @ S_vi @ A)
        S_vi = Q + A.T @ S_vi @ (A - B @ K_vi)
    np.testing.assert_allclose(S, S_vi, atol=1e-8)
    np.testing.assert_allclose(K, K_vi, atol=1e-8)


def test_dlyap():
    A = np.array([[0.5, 0.1], [0.0, 0.3]])
    Q = np.eye(2)
    X = dlyap(A, Q)
    np.testing.assert_allclose(A @ X @ A.T - X + Q, 0, atol=1e-10)


def test_c2d_zoh_analytic():
    # continuous double integrator: A=[[0,1],[0,0]], B=[0,1]
    Ac = np.array([[0.0, 1.0], [0.0, 0.0]])
    Bc = np.array([[0.0], [1.0]])
    Ts = 0.1
    A, B = c2d(Ac, Bc, Ts)
    np.testing.assert_allclose(A, [[1.0, Ts], [0.0, 1.0]], atol=1e-12)
    np.testing.assert_allclose(B, [[Ts ** 2 / 2], [Ts]], atol=1e-12)


def test_qp_unconstrained():
    P = np.diag([2.0, 4.0])
    q = np.array([-2.0, -4.0])
    sol = solve_qp_dense(P, q)
    np.testing.assert_allclose(sol.z, [1.0, 1.0], atol=1e-9)


def test_qp_equality_only():
    # min x'x s.t. x1 + x2 = 1 -> x = (0.5, 0.5)
    sol = solve_qp_dense(2 * np.eye(2), np.zeros(2),
                         A=np.array([[1.0, 1.0]]), b=np.array([1.0]))
    np.testing.assert_allclose(sol.z, [0.5, 0.5], atol=1e-9)


def test_qp_inequality_active():
    # min (x-2)^2 s.t. x <= 1 -> x = 1, lambda = 2
    sol = solve_qp_dense(np.array([[2.0]]), np.array([-4.0]),
                         G=np.array([[1.0]]), h=np.array([1.0]))
    assert sol.status == "optimal"
    np.testing.assert_allclose(sol.z, [1.0], atol=1e-7)
    np.testing.assert_allclose(sol.lam, [2.0], atol=1e-6)


def test_qp_box_projection_random():
    rng = np.random.default_rng(42)
    n = 8
    for _ in range(5):
        target = rng.normal(size=n) * 2
        # min ||x - target||^2 s.t. -1 <= x <= 1 (analytic: clip)
        P = 2 * np.eye(n)
        q = -2 * target
        G = np.vstack([np.eye(n), -np.eye(n)])
        h = np.ones(2 * n)
        sol = solve_qp_dense(P, q, G=G, h=h)
        assert sol.status == "optimal"
        np.testing.assert_allclose(sol.z, np.clip(target, -1, 1), atol=1e-7)


def test_qp_mixed_random_kkt():
    rng = np.random.default_rng(7)
    n, meq, mi = 12, 3, 10
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(meq, n))
    b = rng.normal(size=meq)
    G = rng.normal(size=(mi, n))
    h = rng.normal(size=mi) + 1.0
    sol = solve_qp_dense(P, q, A=A, b=b, G=G, h=h)
    assert sol.status == "optimal"
    # KKT conditions
    np.testing.assert_allclose(A @ sol.z, b, atol=1e-7)
    assert np.all(G @ sol.z <= h + 1e-7)
    assert np.all(sol.lam >= -1e-9)
    grad = P @ sol.z + q + A.T @ sol.y + G.T @ sol.lam
    np.testing.assert_allclose(grad, 0, atol=1e-6)
    # complementary slackness
    np.testing.assert_allclose(sol.lam * (h - G @ sol.z), 0, atol=1e-6)
