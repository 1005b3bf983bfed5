"""Condensed (state-eliminated) QP formulation: exact equivalence.

``condense_template`` eliminates x_1..x_N through the dynamics — a pure
reformulation, so every solution recovered through S must match the FULL
template's oracle solution, and condensed closed-loop rollouts must match
uncondensed ones.  Motivation + measurements in ACCURACY.md (the sparse
form's dynamics rows + singular cost stall ADMM on the cartpole geometry).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rtmpc_tpu.utils.polytope import box
from rtmpc_tpu.models.specs import (setup_extended_tube_tracking,
                                    setup_regulator, setup_tracking,
                                    setup_tube_regulator,
                                    setup_tube_tracking)
from rtmpc_tpu.ops.assembly import condense_template
from rtmpc_tpu.ops.qp import admm_solve, prepare_admm
from rtmpc_tpu.parallel.rollout import make_rollout_fn

A = np.array([[1.0, 1.0], [0.0, 1.0]])
B = np.array([[0.0], [1.0]])
Q = np.eye(2)
R = np.eye(1)
X = box(np.array([8.0, 8.0]))
U = box(np.array([1.0]))
W = box(np.array([0.1, 0.1]))


def _setups():
    return {
        "regulator": setup_regulator(A, B, Q, R, 10, X, U),
        "tracking": setup_tracking(A, B, Q, R, 10, X, U),
        "tube_regulator": setup_tube_regulator(A, B, Q, R, 9, X, U, W),
        "tube_tracking": setup_tube_tracking(A, B, Q, R, 10, X, U, W,
                                             fixed_initial_state=True),
    }


@pytest.mark.parametrize("name", ["regulator", "tracking",
                                  "tube_regulator", "tube_tracking"])
def test_condensed_solution_matches_full_oracle(name):
    setup = _setups()[name]
    t = setup.template
    tc = condense_template(t)
    assert tc.n < t.n and tc.m == t.m - t.N * t.nx
    spec = prepare_admm(tc, dtype=jnp.float64)
    solve = jax.jit(lambda th: admm_solve(spec, th, iters=1500,
                                          polish=True))
    rng = np.random.default_rng(0)
    for _ in range(3):
        th = np.zeros(t.ntheta)
        th[:2] = rng.uniform(-2, 2, 2)
        th[2] = rng.uniform(-4, 4)
        sol_ip, _ = t.solve_dense(th[:2], th[2:4])
        assert sol_ip.status == "optimal"
        v = np.asarray(solve(jnp.asarray(th)).z_primal)[:tc.n]
        zf = tc.S @ v
        err = np.max(np.abs(zf - sol_ip.z)) / (1 + np.abs(sol_ip.z).max())
        assert err < 2e-5, f"{name}: condensed-vs-full rel err {err:.2e}"


def _rollout(setup, condensed, T=50, **kw):
    arrays, cfg = setup.to_device(dtype=jnp.float64, condensed=condensed,
                                  iters=60, iters2=60, alpha=1.8,
                                  rho2_scale=0.2, **kw)
    fn = jax.jit(make_rollout_fn(arrays, cfg, T))
    rng = np.random.default_rng(4)
    theta = (rng.uniform(size=T) >= 0.7).astype(np.int64)
    gamma = (rng.uniform(size=T) >= 0.7).astype(np.int64)
    theta[0] = gamma[0] = 1
    w = rng.uniform(-0.1, 0.1, size=(T, 2))
    refs = np.zeros((T, 2))
    refs[:20, 0] = 5.0
    refs[20:, 0] = 4.0
    carry, outs = fn(jnp.asarray([1.0, 2.0]), jnp.asarray(refs),
                     jnp.asarray(w), jnp.asarray(theta, jnp.int32),
                     jnp.asarray(gamma, jnp.int32))
    return np.asarray(outs.x), np.asarray(outs.u)


def test_condensed_rollout_ip_solver():
    """Closed-loop equivalence through the exact (IP) solver.  NOTE:
    equal-budget ADMM equivalence does NOT hold and is not asserted —
    condensing changes the ADMM's convergence rate (S carries A^k growth
    into the Hessian; measured: WORSE on the double integrator, see
    ACCURACY.md).  Condensing's value is making the per-iteration IP
    factorization small ((n_red+me)^2 vs (n+me)^2 KKT)."""
    setup = setup_tube_tracking(A, B, Q, R, 10, X, U, W,
                                fixed_initial_state=True)
    x_f, _ = _rollout(setup, condensed=False, solver="ip", ip_iters=30)
    x_c, _ = _rollout(setup, condensed=True, solver="ip", ip_iters=30)
    np.testing.assert_allclose(x_c, x_f, atol=1e-6)


def test_condensed_extended_rollout_ip():
    setup = setup_extended_tube_tracking(A, B, Q, R, 10, X, U,
                                         box(np.array([0.05, 0.05])),
                                         fixed_initial_state=False)
    x_f, u_f = _rollout(setup, condensed=False, solver="ip", ip_iters=30)
    x_c, u_c = _rollout(setup, condensed=True, solver="ip", ip_iters=30)
    np.testing.assert_allclose(x_c, x_f, atol=1e-6)
