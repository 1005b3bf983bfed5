"""Cartpole plant tests: linearization identity, integrator sanity, ZOH."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtmpc_tpu.models.plants import (CartpoleParams, cartpole_derivatives,
                                     cartpole_linearized, cartpole_step,
                                     cartpole_zoh_step, linear_plant_step)
from rtmpc_tpu.utils.synthesis import c2d, dlqr


def test_linearization_matches_reference_constants():
    """Ac/Bc must equal the hardcoded matrices of
    ``results_linear_system.py:40-51`` for the same parameters."""
    p = CartpoleParams()
    Ac, Bc, Cc = cartpole_linearized(p)
    M, m, I, g, l = p.M, p.m, p.I, p.g, p.l
    denom = I * (M + m) + M * m * l ** 2
    np.testing.assert_allclose(Ac[1, 2], -(m ** 2 * g * l ** 2) / denom)
    np.testing.assert_allclose(Ac[3, 2], m * g * l * (M + m) / denom)
    np.testing.assert_allclose(Bc[1, 0], (I + m * l ** 2) / denom)
    np.testing.assert_allclose(Bc[3, 0], -m * l / denom)


def test_derivatives_linearize_to_Ac_Bc():
    """Numerical Jacobian of the nonlinear ODE at the origin == (Ac, Bc)."""
    p = CartpoleParams()
    Ac, Bc, _ = cartpole_linearized(p)
    f = lambda x, u: cartpole_derivatives(p, x, u)
    x0 = jnp.zeros(4)
    J = jax.jacobian(f, argnums=0)(x0, 0.0)
    Ju = jax.jacobian(lambda u: f(x0, u))(0.0)
    np.testing.assert_allclose(np.asarray(J), Ac, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Ju).reshape(-1, 1), Bc,
                               atol=1e-10)


def test_upright_unstable_falls():
    p = CartpoleParams()
    x = jnp.array([0.0, 0.0, 0.01, 0.0])
    for _ in range(500):  # 1 s of free fall at 500 Hz
        x = cartpole_step(p, x, 0.0, 1.0 / 500, method="rk4")
    assert abs(float(x[2])) > 0.1  # inverted pendulum diverges from upright


def test_lqr_stabilizes_nonlinear():
    p = CartpoleParams()
    Ac, Bc, _ = cartpole_linearized(p)
    A, B = c2d(Ac, Bc, 0.02)
    K, _, _ = dlqr(A, B, np.diag([100.0, 10, 100, 10]), 0.1 * np.eye(1))
    x = jnp.array([0.2, 0.0, 0.1, 0.0])
    for _ in range(250):  # 5 s at 50 Hz
        u = -float(K @ np.asarray(x))
        x = cartpole_zoh_step(p, x, u, 0.02, 10)
    assert float(jnp.linalg.norm(x)) < 1e-2


def test_rk4_vs_euler_consistency():
    p = CartpoleParams()
    x0 = jnp.array([0.1, -0.2, 0.05, 0.1])
    xe = x0
    xr = x0
    for _ in range(50):
        xe = cartpole_step(p, xe, 1.0, 1.0 / 500,
                           method="semi_implicit_euler")
        xr = cartpole_step(p, xr, 1.0, 1.0 / 500, method="rk4")
    np.testing.assert_allclose(np.asarray(xe), np.asarray(xr), atol=1e-3)


def test_linear_plant_step():
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    x = jnp.array([1.0, 2.0])
    u = jnp.array([0.5])
    w = jnp.array([0.01, -0.01])
    out = linear_plant_step(jnp.asarray(A), jnp.asarray(B), x, u, w)
    np.testing.assert_allclose(np.asarray(out), [3.01, 2.49], atol=1e-12)
