"""Plant-side smart/consistent actuator as a branchless pure step function.

Re-design of ``SmartActuator.py`` (classes ``SmartActuator`` :11-123 and
``ConsistentActuator`` :125-230) for batched scanned execution:

* The unbounded loss-history vector ``theta_t_vec`` and its product
  ``Theta_t = theta_t * prod(theta[q_t+1:])`` (:57-71) collapse to a single
  integer: ``last_drop`` (the last time theta was 0).  The product over
  ``(q_pkt, t]`` is 1 iff no drop happened after ``q_pkt``, i.e.
  ``last_drop <= q_pkt`` — O(1), branchless, exact.
* All ``if Theta == 1`` updates become ``jnp.where`` selects.
* The control-playback branch ``u = U[t - s_t]`` vs terminal law
  ``u = U[-1] - K x`` (:90-107) is a clipped dynamic gather + select.

One function covers both actuator classes: ``mode="smart"`` evaluates the
playback/terminal law on the measured plant state and returns ``{x_t, s_t}``
packets (Pezzutto); ``mode="consistent"`` runs the nominal plant model +
ancillary controller ``u = u_nom - K_plant (x - x_nom)`` (:166-172) and
returns ``{x_nom, s_t}`` packets — or ``{x_t, s_t, x_nom_t}`` and accepts
``x_nom_0`` resets in extended-MPC operation (:215-230).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from ..ops.precision import mm

__all__ = ["ActuatorState", "init_actuator", "actuator_step"]


class ActuatorState(NamedTuple):
    t: jax.Array          # () int32 internal timer
    q: jax.Array          # () int32 last controller-ack time known here
    s: jax.Array          # () int32 last accept time
    last_drop: jax.Array  # () int32 last time theta == 0 (-1 if never)
    Theta: jax.Array      # () int32 consistency indicator of the last step
    u_buf: jax.Array      # (N+1, nu) accepted control sequence
    x_nom: jax.Array      # (nx,) nominal plant state (consistent mode)


def init_actuator(N: int, nx: int, nu: int, x0, dtype) -> ActuatorState:
    i32 = jnp.int32
    return ActuatorState(
        t=jnp.zeros((), i32), q=jnp.zeros((), i32), s=jnp.zeros((), i32),
        last_drop=jnp.full((), -1, i32), Theta=jnp.zeros((), i32),
        u_buf=jnp.zeros((N + 1, nu), dtype),
        x_nom=jnp.asarray(x0, dtype).reshape(nx),
    )


def actuator_step(
    state: ActuatorState,
    U_t: jax.Array,        # (N+1, nu) controller packet payload
    q_pkt: jax.Array,      # () int32 controller packet q_t
    x_nom0_pkt: jax.Array, # (nx,) optimal initial nominal state (extended)
    x_t: jax.Array,        # (nx,) measured plant state
    theta_t: jax.Array,    # () int32 delivery indicator c->p
    A: jax.Array, B: jax.Array,
    K_ss: jax.Array, K_plant: jax.Array,
    N: int,
    mode: str = "consistent",
    extended: bool = False,
) -> Tuple[jax.Array, Tuple, ActuatorState, dict]:
    """One ``process_packet`` call (``SmartActuator.py:31-54`` /
    ``:174-213``).  Returns ``(u_t, plant_packet, new_state, aux)`` where
    ``plant_packet = (x_reply, u_reply, x_nom_reply)``.

    ``u_reply`` is the input the estimator's history-based reconstruction
    would recover from ``(x_reply, s_t)`` — which, by the consistency
    invariant, is exactly the input this function just computed (the
    nominal input in consistent mode, the applied input otherwise); see
    ``estimator.py`` module docstring.
    """
    # consistency metric and timestamps (eqs. (17), (18) of Pezzutto)
    last_drop = jnp.where(theta_t == 0, state.t, state.last_drop)
    Theta = jnp.logical_and(theta_t == 1, last_drop <= q_pkt)
    q_new = jnp.where(theta_t == 1, q_pkt, state.q)
    s_new = jnp.where(Theta, state.t, state.s)

    # buffer accept (and nominal-model resync in extended mode)
    u_buf = jnp.where(Theta, U_t, state.u_buf)
    x_nom = state.x_nom
    if extended:
        x_nom = jnp.where(Theta, x_nom0_pkt, x_nom)

    # control playback vs terminal law
    idx = state.t - s_new
    u_play = u_buf[jnp.clip(idx, 0, N - 1)]
    law_state = x_nom if mode == "consistent" else x_t
    u_term = u_buf[N] - mm(K_ss, law_state)
    u_nom = jnp.where(idx < N, u_play, u_term)

    if mode == "consistent":
        u_t = u_nom - mm(K_plant, x_t - x_nom)
        x_reply = x_t if extended else x_nom
        x_nom_next = mm(A, x_nom) + mm(B, u_nom)
    else:
        u_t = u_nom
        x_reply = x_t
        x_nom_next = x_nom  # unused

    u_reply = u_nom if (mode == "consistent" and not extended) else u_t
    plant_packet = (x_reply, u_reply, x_nom)
    new_state = ActuatorState(
        t=state.t + 1, q=q_new, s=s_new, last_drop=last_drop,
        Theta=Theta.astype(jnp.int32), u_buf=u_buf, x_nom=x_nom_next)
    aux = {"Theta": Theta.astype(jnp.int32), "x_nom": x_nom, "u_nom": u_nom}
    return u_t, plant_packet, new_state, aux
