"""Fused Pallas ADMM kernel parity vs the vmapped XLA path.

Runs the kernel in interpreter mode (tests force the CPU backend, see
``conftest.py``); on-device numerics are additionally covered by the bench
(``feasible_frac``) and the TPU app invariant checks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rtmpc_tpu.utils import box
from rtmpc_tpu.models import setup_tube_tracking
from rtmpc_tpu.ops.qp import admm_solve, init_admm_state, ADMMState
from rtmpc_tpu.ops.qp_pallas import admm_solve_pallas


def _flagship_spec(dtype=jnp.float32):
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, cfg = setup.to_device(dtype=dtype, iters=60)
    return arrays.admm


def test_pallas_matches_vmapped_admm_cold_start():
    spec = _flagship_spec()
    rng = np.random.default_rng(0)
    B = 12                                   # exercises batch padding too
    theta = jnp.asarray(rng.uniform(-2, 2, (B, 4)), jnp.float32)

    ref = jax.vmap(lambda t: admm_solve(spec, t, init_admm_state(spec),
                                        iters=40))(theta)
    pal = admm_solve_pallas(spec, theta, iters=40, block_b=8,
                            interpret=True)

    np.testing.assert_allclose(np.asarray(pal.z_primal),
                               np.asarray(ref.z_primal), atol=1e-5)
    # residuals are diagnostics; f32 accumulation order differs between
    # the interpreter's dot and XLA's, so compare loosely
    np.testing.assert_allclose(np.asarray(pal.r_prim),
                               np.asarray(ref.r_prim), rtol=5e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.r_dual),
                               np.asarray(ref.r_dual), rtol=5e-2, atol=1e-4)


def test_pallas_warm_start_state_round_trip():
    """The returned state warm-starts the next solve identically to the
    per-element path (the rollout carries it across scan steps)."""
    spec = _flagship_spec()
    rng = np.random.default_rng(1)
    B = 8
    th1 = jnp.asarray(rng.uniform(-1, 1, (B, 4)), jnp.float32)
    th2 = jnp.asarray(rng.uniform(-1, 1, (B, 4)), jnp.float32)

    ref1 = jax.vmap(lambda t: admm_solve(spec, t, init_admm_state(spec),
                                         iters=25))(th1)
    ref2 = jax.vmap(lambda t, s: admm_solve(spec, t, s, iters=25))(
        th2, ref1.state)

    pal1 = admm_solve_pallas(spec, th1, iters=25, block_b=8, interpret=True)
    pal2 = admm_solve_pallas(spec, th2, pal1.state, iters=25, block_b=8,
                             interpret=True)

    np.testing.assert_allclose(np.asarray(pal2.z_primal),
                               np.asarray(ref2.z_primal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal2.state.y),
                               np.asarray(ref2.state.y), atol=2e-3)
