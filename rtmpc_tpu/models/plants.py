"""Plants: linear disturbance-driven model and the analytic cartpole.

The reference validates the linear-design controllers on a PyBullet cartpole
stepped at 500 Hz with a 50 Hz zero-order-hold control
(``Results/Cartpole/cartpole.py``, ``results_nonlinear_system.py:255-329``).
PyBullet is not vmappable; here the cartpole is the analytic rigid-body ODE
(same parameters as the URDF / the linearization in
``results_linear_system.py:31-55``) integrated with semi-implicit Euler (the
PyBullet scheme) or RK4, fully batchable inside jitted rollouts.

State convention: ``x = (p, p_dot, phi, phi_dot)`` with ``phi`` measured
from the *upright* equilibrium (matching the linearized A matrix's positive
``m g l (M+m)/p`` entry at ``results_linear_system.py:41-44``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["linear_plant_step", "CartpoleParams", "cartpole_derivatives",
           "cartpole_step", "cartpole_linearized", "cartpole_zoh_step"]


def linear_plant_step(A, B, x, u, w):
    """``x+ = A x + B u + w`` — the per-step plant update of every linear
    benchmark (e.g. ``Example_of_Tube_Tracking_MPC_Over_Lossy_Network.py:152``).
    Shapes: x (nx,), u (nu,), w (nx,)."""
    return A @ x + B @ u + w


@dataclasses.dataclass(frozen=True)
class CartpoleParams:
    """Parameters of ``results_linear_system.py:31-38`` / the URDF."""
    M: float = 1.0       # cart mass
    m: float = 0.1       # pole mass
    b: float = 0.0       # cart friction
    I: float = 0.001     # pole inertia about its COM
    g: float = 9.8
    l: float = 0.5       # distance to pole COM

    @property
    def p(self) -> float:
        return self.I * (self.M + self.m) + self.M * self.m * self.l ** 2


def cartpole_derivatives(params: CartpoleParams, x, force):
    """Nonlinear cartpole ODE, consistent with the reference linearization.

    With phi from upright (sin phi ~ phi destabilizing):
        denom = (I+m l^2)(M+m) - m^2 l^2 cos^2(phi)
        p_ddot   = [ (I+m l^2)(F + m l phi_dot^2 s - b p_dot)
                     - m^2 l^2 g s c ] / denom
        phi_ddot = [ m l ( (M+m) g s - c (F + m l phi_dot^2 s - b p_dot) ) ]
                   / denom
    Linearizing at the origin reproduces Ac/Bc of
    ``results_linear_system.py:40-51`` exactly (checked in tests).
    """
    M, m, b, I, g, l = (params.M, params.m, params.b, params.I,
                        params.g, params.l)
    pos_dot = x[1]
    phi = x[2]
    phi_dot = x[3]
    s = jnp.sin(phi)
    c = jnp.cos(phi)
    ml2 = I + m * l ** 2
    denom = ml2 * (M + m) - (m * l * c) ** 2
    f_eff = force + m * l * phi_dot ** 2 * s - b * pos_dot
    p_ddot = (ml2 * f_eff - m ** 2 * l ** 2 * g * s * c) / denom
    phi_ddot = (m * l * ((M + m) * g * s - c * f_eff)) / denom
    return jnp.stack([pos_dot, p_ddot, phi_dot, phi_ddot])


def cartpole_step(params: CartpoleParams, x, force, dt,
                  method: str = "semi_implicit_euler"):
    """One physics step at ``dt`` (reference: 1/500 s).

    ``semi_implicit_euler`` matches PyBullet's integrator family (velocities
    first, then positions); ``rk4`` is higher-order for reference solutions.
    """
    if method == "rk4":
        k1 = cartpole_derivatives(params, x, force)
        k2 = cartpole_derivatives(params, x + 0.5 * dt * k1, force)
        k3 = cartpole_derivatives(params, x + 0.5 * dt * k2, force)
        k4 = cartpole_derivatives(params, x + dt * k3, force)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    if method == "semi_implicit_euler":
        d = cartpole_derivatives(params, x, force)
        v_new = x[1] + dt * d[1]
        w_new = x[3] + dt * d[3]
        return jnp.stack([x[0] + dt * v_new, v_new,
                          x[2] + dt * w_new, w_new])
    raise ValueError(f"unknown method {method!r}")


def cartpole_zoh_step(params: CartpoleParams, x, force, Th: float,
                      n_substeps: int, method: str = "semi_implicit_euler"):
    """Hold ``force`` for ``n_substeps`` physics steps of ``Th/n_substeps``
    — the 50 Hz control / 500 Hz physics ZOH loop of
    ``results_nonlinear_system.py:255-329`` as one scanned update."""
    dt = Th / n_substeps

    def body(x_c, _):
        return cartpole_step(params, x_c, force, dt, method=method), None

    x_out, _ = jax.lax.scan(body, x, None, length=n_substeps)
    return x_out


def cartpole_linearized(params: CartpoleParams = CartpoleParams()):
    """Continuous-time (Ac, Bc, Cc) of ``results_linear_system.py:40-55``."""
    M, m, b, I, g, l = (params.M, params.m, params.b, params.I,
                        params.g, params.l)
    p = params.p
    Ac = np.array([
        [0.0, 1.0, 0.0, 0.0],
        [0.0, -(I + m * l ** 2) * b / p, -(m ** 2 * g * l ** 2) / p, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.0, -(m * l * b) / p, m * g * l * (M + m) / p, 0.0],
    ])
    Bc = np.array([[0.0], [(I + m * l ** 2) / p], [0.0], [-m * l / p]])
    Cc = np.array([[1.0, 0, 0, 0], [0, 0, 1.0, 0]])
    return Ac, Bc, Cc
