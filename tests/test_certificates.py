"""OSQP-style infeasibility certificates: unit + closed-loop arm-stop.

The reference stops the non-robust tracking arm when Clarabel reports the
QP infeasible (``track_feasible``,
``/root/reference/Results/results_linear_system.py:262-271``).  The engine
reproduces that with primal/dual infeasibility certificates on the ADMM
deltas (Banjac et al. 2019; ``ops/qp.py:infeasibility_certificates``),
driven by ``infeas_mode="certificate"`` in the rollout engine.

Covers: a constructed primal-infeasible tracking QP fires the primal
certificate (and the f64 interior-point oracle agrees); feasible instances
stay silent; the closed-loop engine freezes an element once certified and
the firing step's estimate is oracle-infeasible too; the batched pallas
dispatch path applies the same semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtmpc_tpu.utils.polytope import box
from rtmpc_tpu.models.specs import setup_tracking
from rtmpc_tpu.ops.qp import (admm_solve, infeasibility_certificates,
                              init_admm_state, prepare_admm)
from rtmpc_tpu.parallel.rollout import make_batched_rollout, make_rollout_fn

NX, NU = 2, 1
A = np.array([[1.0, 1.0], [0.0, 1.0]])
B = np.array([[0.0], [1.0]])
Q = np.eye(2)
R = np.eye(1)
X = box(np.array([8.0, 8.0]))
U = box(np.array([1.0]))


@pytest.fixture(scope="module")
def track_setup():
    return setup_tracking(A, B, Q, R, 10, X, U)


@pytest.fixture(scope="module")
def track_spec(track_setup):
    return prepare_admm(track_setup.template, dtype=jnp.float64)


def _certify(spec, theta, iters=400):
    sol = admm_solve(spec, jnp.asarray(theta), iters=iters)
    return infeasibility_certificates(spec, jnp.asarray(theta), sol.state)


def test_primal_certificate_fires_on_infeasible_qp(track_setup, track_spec):
    # x_init outside the state box conflicts with the fixed initial-state
    # equality (init_mode="fixed"): the QP has an empty feasible set.
    theta = np.array([20.0, 0.0, 0.0, 0.0])
    sol_ip, _ = track_setup.template.solve_dense(theta[:NX], theta[NX:])
    assert sol_ip.status != "optimal"
    pinf, dinf = _certify(track_spec, theta)
    assert bool(pinf), "primal certificate must fire on an empty QP"


def test_certificates_silent_on_feasible_qp(track_setup, track_spec):
    for theta in ([1.0, 2.0, 5.0, 0.0], [0.0, 0.0, -9.0, 0.0],
                  [-4.0, 1.0, 4.0, 0.0]):
        sol_ip, _ = track_setup.template.solve_dense(
            np.asarray(theta[:NX]), np.asarray(theta[NX:]))
        assert sol_ip.status == "optimal"
        pinf, dinf = _certify(track_spec, np.asarray(theta))
        assert not bool(pinf) and not bool(dinf), (
            f"false certificate on feasible theta={theta}")


def _benign_inputs(T):
    rng = np.random.default_rng(3)
    refs = np.zeros((T, NX))
    refs[:, 0] = 5.0
    w = rng.uniform(-0.05, 0.05, size=(T, NX))
    theta = np.ones(T, np.int64)
    gamma = np.ones(T, np.int64)
    return refs, w, theta, gamma


def _hostile_inputs(T):
    """Loss + a disturbance burst that drives the true state outside X so
    the non-robust tracking QP (fixed initial state) goes infeasible."""
    refs, w, theta, gamma = _benign_inputs(T)
    w = w.copy()
    w[8:14] = np.array([2.5, 2.5])     # burst pushes x outside the box
    return refs, w, theta, gamma


@pytest.mark.parametrize("engine", ["vmapped", "pallas_dispatch"])
def test_closed_loop_certificate_arm_stop(track_setup, engine):
    T = 30
    arrays, cfg = track_setup.to_device(
        dtype=jnp.float64, iters=400,
        solver="pallas" if engine == "pallas_dispatch" else "admm",
        pallas_interpret=True)

    fn = make_batched_rollout(arrays, cfg, T, actuator_mode="smart",
                              infeas_mode="certificate")
    fn = jax.jit(fn)

    refs_b, w_b, th_b, gm_b = [], [], [], []
    for mk in (_benign_inputs, _hostile_inputs):
        refs, w, theta, gamma = mk(T)
        refs_b.append(refs); w_b.append(w)
        th_b.append(theta); gm_b.append(gamma)
    x0 = np.zeros((2, NX))
    carry, outs = fn(jnp.asarray(x0), jnp.asarray(np.stack(refs_b)),
                     jnp.asarray(np.stack(w_b)),
                     jnp.asarray(np.stack(th_b), jnp.int32),
                     jnp.asarray(np.stack(gm_b), jnp.int32))
    feas = np.asarray(carry.feasible)
    step_feas = np.asarray(outs.feasible)
    assert bool(feas[0]), "benign element must stay feasible"
    assert not bool(feas[1]), "hostile element must be certified infeasible"

    # the firing step's estimate must be infeasible per the f64 IP oracle
    # (matching the reference's Clarabel-status semantics)
    t_fire = int(np.argmin(step_feas[1]))
    x_hat = np.asarray(outs.x_hat)[1, t_fire]
    sol_ip, _ = track_setup.template.solve_dense(x_hat, refs_b[1][t_fire])
    assert sol_ip.status != "optimal", (
        f"engine certified step {t_fire} infeasible but oracle solves "
        f"x_hat={x_hat}")

    # frozen element: state stops advancing after the stop
    xs = np.asarray(outs.x)[1]
    assert np.allclose(xs[t_fire], xs[-1]), "state must freeze once stopped"


def test_extended_arm_certificate_stop():
    """The nonlinear extended benchmark stops the EXTENDED tube arm on its
    QP's infeasibility (``ext_tube_feasible``,
    ``results_nonlinear_system_with_extendedMPC.py:324,374``).  The
    engine's certificate path must certify the QP actually selected by the
    previous gamma (normal vs packet-received) and freeze the element."""
    from rtmpc_tpu.models.specs import setup_extended_tube_tracking
    setup = setup_extended_tube_tracking(
        A, B, Q, R, 10, X, U, box(np.array([0.05, 0.05])),
        fixed_initial_state=False)
    T = 30
    arrays, cfg = setup.to_device(dtype=jnp.float64, iters=400)
    refs, w, theta, gamma = _hostile_inputs(T)
    fn = jax.jit(make_rollout_fn(arrays, cfg, T, actuator_mode="consistent",
                                 infeas_mode="certificate"))
    carry, outs = fn(jnp.zeros(NX), jnp.asarray(refs), jnp.asarray(w),
                     jnp.asarray(theta, jnp.int32),
                     jnp.asarray(gamma, jnp.int32))
    assert not bool(carry.feasible), \
        "extended arm must stop when its QP is certified infeasible"
    # benign run stays feasible
    refs_b, w_b, th_b, gm_b = _benign_inputs(T)
    carry_b, _ = fn(jnp.zeros(NX), jnp.asarray(refs_b), jnp.asarray(w_b),
                    jnp.asarray(th_b, jnp.int32),
                    jnp.asarray(gm_b, jnp.int32))
    assert bool(carry_b.feasible)


def test_no_false_stop_without_certificate_mode(track_setup):
    """Default mode (infeas_mode=None) only freezes on non-finite iterates:
    the hostile scenario keeps 'running' (reference parity: only the arm
    with the feasibility guard stops)."""
    T = 30
    arrays, cfg = track_setup.to_device(dtype=jnp.float64, iters=200)
    refs, w, theta, gamma = _hostile_inputs(T)
    fn = jax.jit(make_rollout_fn(arrays, cfg, T, actuator_mode="smart"))
    carry, _ = fn(jnp.zeros(NX), jnp.asarray(refs), jnp.asarray(w),
                  jnp.asarray(theta, jnp.int32),
                  jnp.asarray(gamma, jnp.int32))
    assert bool(carry.feasible)
