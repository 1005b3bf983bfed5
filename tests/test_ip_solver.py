"""Batched interior-point solver parity vs the float64 host oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from rtmpc_tpu.utils.polytope import Polytope, box
from rtmpc_tpu.utils.synthesis import dlqr, dlyap
from rtmpc_tpu.models.specs import setup_tube_regulator, setup_tube_tracking
from rtmpc_tpu.ops.assembly import build_mpc_qp
from rtmpc_tpu.ops.ip import prepare_ip, ip_solve

A = np.array([[1.0, 1.0], [0.0, 1.0]])
B = np.array([[0.0], [1.0]])


def test_ip_matches_oracle_tracking():
    K, _, _ = dlqr(A, B, np.eye(2), np.eye(1))
    Ql = np.eye(2) + K.T @ K
    P = dlyap(A - B @ K, (Ql + Ql.T) / 2)
    tmpl = build_mpc_qp(
        A, B, np.eye(2), np.eye(1), 10, tracking=True, P_term=P,
        Tout=10 * P, Hx=np.vstack([np.eye(2), -np.eye(2)]),
        hx=8 * np.ones(4), Hu=np.array([[1.0], [-1.0]]), hu=np.ones(2))
    spec = prepare_ip(tmpl, dtype=jnp.float64)
    solve = jax.jit(lambda th: ip_solve(spec, th, iters=25))
    for th in [np.array([1.0, 2.0, 5.0, 0.0]),
               np.array([0.0, 0.0, -9.0, 0.0]),
               np.array([-6.0, 1.0, 9.0, 0.0])]:
        ip_ref, _ = tmpl.solve_dense(th[:2], th[2:])
        s = solve(jnp.asarray(th))
        z = np.asarray(s.z_primal)[:tmpl.n]
        assert float(s.r_prim) < 1e-9
        assert float(s.r_dual) < 1e-7
        np.testing.assert_allclose(z, ip_ref.z, atol=1e-6)


def test_ip_hard_instances():
    """The pathological cases where ADMM stalls: thin-sliver tube-relaxed
    initial sets and R=0.01 anisotropic cost."""
    setup = setup_tube_tracking(A, B, np.eye(2), np.eye(1), 10,
                                box(np.array([8.0, 8.0])),
                                box(np.array([1.0])),
                                box(np.array([0.1, 0.1])))
    spec = prepare_ip(setup.template, dtype=jnp.float64)
    th = jnp.asarray(np.array([-7.6395, 0.1109, 9.0, 0.0]))
    s = ip_solve(spec, th, iters=25)
    assert float(s.r_prim) < 1e-9 and float(s.r_dual) < 1e-8

    X = Polytope(np.array([[0.0, 1.0], [0.0, -1.0],
                           [1.0, 0.0], [-1.0, 0.0]]),
                 np.array([2.0, 50.0, 50.0, 50.0]))
    setup2 = setup_tube_regulator(A, np.array([[0.5], [1.0]]), np.eye(2),
                                  0.01 * np.eye(1), 9, X,
                                  box(np.array([1.0])),
                                  box(np.array([0.1, 0.1])))
    spec2 = prepare_ip(setup2.template, dtype=jnp.float64)
    ref_sol, _ = setup2.template.solve_dense(np.array([-5.0, -2.0]),
                                             np.zeros(2))
    s2 = ip_solve(spec2, jnp.asarray(np.array([-5.0, -2.0, 0.0, 0.0])),
                  iters=25)
    z2 = np.asarray(s2.z_primal)[:setup2.template.n]
    np.testing.assert_allclose(z2, ref_sol.z, atol=1e-6)


def test_ip_batched_vmap():
    setup = setup_tube_tracking(A, B, np.eye(2), np.eye(1), 10,
                                box(np.array([8.0, 8.0])),
                                box(np.array([1.0])),
                                box(np.array([0.1, 0.1])),
                                fixed_initial_state=True)
    spec = prepare_ip(setup.template, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    thetas = np.zeros((8, 4))
    thetas[:, :2] = rng.uniform(-3, 3, (8, 2))
    thetas[:, 2] = rng.uniform(-5, 5, 8)
    sols = jax.jit(jax.vmap(lambda th: ip_solve(spec, th, iters=25)))(
        jnp.asarray(thetas))
    for i in range(8):
        ref_sol, _ = setup.template.solve_dense(thetas[i, :2],
                                                thetas[i, 2:])
        z = np.asarray(sols.z_primal[i])[:setup.template.n]
        # weakly-determined components of degenerate optima may differ by
        # ~1e-5 between two KKT-exact solvers
        np.testing.assert_allclose(z, ref_sol.z, atol=1e-4)
