"""Controller-side state estimator as a pure step function.

Re-design of ``Estimator.py`` (``Estimator`` :9-98, ``RobustEstimator``
:101-162) exploiting a protocol invariant for O(1) state:

The reference estimator keeps an unbounded list of every sent control
sequence (``store_sent_control_sequence`` :34-41) and, on packet receipt,
reconstructs the input the actuator applied by looking up
``controlSequences[s_t]`` and replaying it at offset ``t - s_t``
(:50-65).  But the consistency protocol guarantees that the sequence the
actuator is playing IS the sequence the controller sent at time ``s_t``
(acceptance only happens when ``Theta_t == 1``, ``SmartActuator.py:81-88``,
and t=0 delivery is forced) — so the reconstruction always reproduces, to
the last bit, the input the actuator itself computed.  Here the simulated
reply packet therefore carries that input directly and the ``(T, N+1, nu)``
history buffer disappears: no per-step ``dynamic_update_slice``, no
per-element gather, no O(T) memory in the scan carry.  Trajectory parity
with the reference's literal history-based estimator is asserted in
``tests/test_rollout_parity.py``.

Estimator dynamics (Pezzutto eqs. (13)-(15)):
* packet received (gamma=1): propagate the replied state through the model
  with the replied input — ``x_hat = A x_pkt + B u_pkt`` (:50-65).
* packet lost (gamma=0): propagate the previous estimate with the first
  input of the sequence just sent (:67-74); the robust variant (extended
  MPC, :143-156) instead propagates from the stored optimal initial nominal
  state of the current solve.
* ``q_t = gamma t + (1-gamma) q_t`` (:87-92) — already branchless in the
  reference; kept verbatim.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.precision import mm

__all__ = ["EstimatorState", "init_estimator", "store_sequence",
           "estimator_update"]


class EstimatorState(NamedTuple):
    x_hat: jax.Array       # (nx,) current estimate
    t: jax.Array           # () int32
    q: jax.Array           # () int32 last successful p->c reception time
    x_nom0_mpc: jax.Array  # (nx,) stored optimal x_nom(0) (robust variant)


def init_estimator(T: int, N: int, nx: int, nu: int, x0,
                   dtype) -> EstimatorState:
    """``T`` and ``N`` are kept in the signature for call-site stability;
    the O(1) state needs neither."""
    del T, N, nu
    return EstimatorState(
        x_hat=jnp.asarray(x0, dtype).reshape(nx),
        t=jnp.zeros((), jnp.int32), q=jnp.zeros((), jnp.int32),
        x_nom0_mpc=jnp.zeros(nx, dtype),
    )


def store_sequence(state: EstimatorState, U_t: jax.Array,
                   x_nom0: jax.Array) -> EstimatorState:
    """(robust) ``store_current_optimal_inital_nominal_plant_states``
    (``Estimator.py:158-162``).  The sent sequence itself no longer needs
    storing (see module docstring); pass ``U_t`` to ``estimator_update``."""
    del U_t
    return state._replace(x_nom0_mpc=x_nom0)


def estimator_update(
    state: EstimatorState,
    plant_packet,               # (x_reply (nx,), u_reply (nu,), x_nom (nx,))
    gamma_t: jax.Array,         # () int32 delivery indicator p->c
    A: jax.Array, B: jax.Array,
    U_t: jax.Array,             # (N+1, nu) sequence sent THIS step
    robust: bool = False,
) -> EstimatorState:
    """One ``update_estimate`` call (``Estimator.py:43-78`` / robust
    :113-156); returns the new state."""
    x_pkt, u_pkt = plant_packet[0], plant_packet[1]

    # received: model propagation of the replied (state, input) pair —
    # identical to the reference's history-based reconstruction (:50-65)
    x_hat_recv = mm(A, x_pkt) + mm(B, u_pkt)

    # lost: propagate with the first input of the just-sent sequence (:67-74)
    x_base = state.x_nom0_mpc if robust else state.x_hat
    x_hat_loss = mm(A, x_base) + mm(B, U_t[0])

    got = gamma_t == 1
    x_hat = jnp.where(got, x_hat_recv, x_hat_loss)
    q_new = gamma_t * state.t + (1 - gamma_t) * state.q    # :87-92
    return state._replace(x_hat=x_hat, t=state.t + 1,
                          q=q_new.astype(jnp.int32))
