"""Controller-side state estimator as a pure step function.

Re-design of ``Estimator.py`` (``Estimator`` :9-98, ``RobustEstimator``
:101-162).  The reference's unbounded Python list of sent control sequences
(``store_sent_control_sequence`` :34-41) becomes a preallocated
``(T, N+1, nu)`` buffer written at index t each step and gathered at the
actuator-reported ``s_t`` — static shape, scan/vmap friendly.

Estimator dynamics (Pezzutto eqs. (13)-(15)):
* packet received (gamma=1): replay the input the actuator applied this step
  (sequence ``s_t`` at offset ``t - s_t``, or the terminal law) and
  propagate the *measured* state through the model.
* packet lost (gamma=0): propagate the previous estimate with the first
  input of the sequence just sent (:67-74).
* ``q_t = gamma t + (1-gamma) q_t`` (:87-92) — already branchless in the
  reference; kept verbatim.

Robust variant (extended MPC): the plant replies with
``{x_t, s_t, x_nom_t}``; the estimator reconstructs the *ancillary* input
``u = u_nom - K_plant (x - x_nom)`` (:113-140), and on loss propagates from
the stored optimal initial nominal state of the current MPC solve
(:143-156).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..ops.precision import mm

__all__ = ["EstimatorState", "init_estimator", "store_sequence",
           "estimator_update"]


class EstimatorState(NamedTuple):
    x_hat: jax.Array      # (nx,) current estimate
    t: jax.Array          # () int32
    q: jax.Array          # () int32 last successful p->c reception time
    seq_buf: jax.Array    # (T, N+1, nu) sent control sequences
    x_nom0_mpc: jax.Array # (nx,) stored optimal x_nom(0) (robust variant)


def init_estimator(T: int, N: int, nx: int, nu: int, x0,
                   dtype) -> EstimatorState:
    return EstimatorState(
        x_hat=jnp.asarray(x0, dtype).reshape(nx),
        t=jnp.zeros((), jnp.int32), q=jnp.zeros((), jnp.int32),
        seq_buf=jnp.zeros((T, N + 1, nu), dtype),
        x_nom0_mpc=jnp.zeros(nx, dtype),
    )


def store_sequence(state: EstimatorState, U_t: jax.Array,
                   x_nom0: jax.Array) -> EstimatorState:
    """``store_sent_control_sequence`` + (robust)
    ``store_current_optimal_inital_nominal_plant_states``."""
    zero = jnp.zeros((), state.t.dtype)
    seq_buf = jax.lax.dynamic_update_slice(
        state.seq_buf, U_t[None], (state.t, zero, zero))
    return state._replace(seq_buf=seq_buf, x_nom0_mpc=x_nom0)


def estimator_update(
    state: EstimatorState,
    plant_packet,               # (x_reply (nx,), s_t () int32, x_nom (nx,))
    gamma_t: jax.Array,         # () int32 delivery indicator p->c
    A: jax.Array, B: jax.Array,
    K_ss: jax.Array, K_plant: jax.Array,
    N: int,
    robust: bool = False,
) -> EstimatorState:
    """One ``update_estimate`` call; returns the new state."""
    x_pkt, s_pkt, x_nom_pkt = plant_packet

    # --- received branch -------------------------------------------------
    useq = state.seq_buf[s_pkt]                  # (N+1, nu) dynamic gather
    idx = state.t - s_pkt
    u_play = useq[jnp.clip(idx, 0, N - 1)]
    if robust:
        u_term = useq[N] - mm(K_ss, x_nom_pkt)
        u_nom = jnp.where(idx < N, u_play, u_term)
        u_recv = u_nom - mm(K_plant, x_pkt - x_nom_pkt)
    else:
        u_term = useq[N] - mm(K_ss, x_pkt)
        u_recv = jnp.where(idx < N, u_play, u_term)
    x_hat_recv = mm(A, x_pkt) + mm(B, u_recv)

    # --- loss branch ------------------------------------------------------
    u_last0 = state.seq_buf[state.t][0]          # first input just sent
    x_base = state.x_nom0_mpc if robust else state.x_hat
    x_hat_loss = mm(A, x_base) + mm(B, u_last0)

    got = gamma_t == 1
    x_hat = jnp.where(got, x_hat_recv, x_hat_loss)
    q_new = gamma_t * state.t + (1 - gamma_t) * state.q
    return state._replace(x_hat=x_hat, t=state.t + 1,
                          q=q_new.astype(jnp.int32))
