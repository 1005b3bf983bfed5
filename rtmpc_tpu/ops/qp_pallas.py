"""Fused batched ADMM QP solver as a Pallas TPU kernel.

``admm_solve`` (``qp.py``) expresses one OSQP-style iteration in jnp and is
vmapped over the batch; under XLA every iteration's intermediates round-trip
through HBM and the scan over (T steps x iters) becomes thousands of tiny
kernel launches.  This kernel instead runs the ENTIRE fixed iteration budget
VMEM-resident per batch tile: the shared problem matrices (``Kinv``, ``As``,
``Ps`` — one factorization per problem *structure*, SURVEY.md section 7.1)
are loaded into VMEM once per tile and the per-instance iterates
``(x, y, z)`` never leave the chip until the final state is written back.

Per iteration and batch tile of ``BT`` instances the kernel does three MXU
matmuls — ``(BT,m)@(m,n)``, ``(BT,n)@(n,n)``, ``(BT,n)@(n,m)`` — plus VPU
projections; with n ~ 40, m ~ 112 the working set for BT = 256 is well under
1 MB, so VMEM holds everything with room for double buffering.

All contractions use ``precision=HIGHEST``: TPU's default f32 matmul feeds
the MXU single-pass bf16 operands, which destabilizes this iteration (see
``ops/precision.py``).

Replaces: per-step CVXPY/Clarabel solves of the reference
(``TubeTrackingMPC.py:183``, ``RegulatorMPC.py:31``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qp import ADMMSpec, ADMMState, ADMMSolution

__all__ = ["admm_solve_pallas"]


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _admm_kernel(sig_alpha_ref, theta_ref, x_ref, y_ref, z_ref,
                 KinvT_ref, As_ref, AsT_ref, PsT_ref,
                 MqT_ref, MlT_ref, MuT_ref,
                 q0_ref, l0_ref, u0_ref, rho_ref, rhoinv_ref,
                 x_out, y_out, z_out, rp_out, rd_out,
                 *, iters: int):
    sigma = sig_alpha_ref[0, 0]
    alpha = sig_alpha_ref[0, 1]
    # per-instance parameter vectors, built once per tile
    th = theta_ref[:]
    q = q0_ref[:] + _dot(th, MqT_ref[:])          # (BT, n)
    l = l0_ref[:] + _dot(th, MlT_ref[:])          # (BT, m)
    u = u0_ref[:] + _dot(th, MuT_ref[:])          # (BT, m)
    rho = rho_ref[:]                              # (1, m) broadcasts
    rho_inv = rhoinv_ref[:]
    As = As_ref[:]
    AsT = AsT_ref[:]
    KinvT = KinvT_ref[:]

    def body(_, s):
        x, y, z = s
        rhs = sigma * x - q + _dot(rho * z - y, As)
        xt = _dot(rhs, KinvT)
        zt = _dot(xt, AsT)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_mix + y * rho_inv, l, u)
        y_new = y + rho * (z_mix - z_new)
        return x_new, y_new, z_new

    x, y, z = jax.lax.fori_loop(
        0, iters, body, (x_ref[:], y_ref[:], z_ref[:]))

    x_out[:] = x
    y_out[:] = y
    z_out[:] = z
    # scaled KKT residuals, per instance (matches qp.admm_solve)
    rp_out[:] = jnp.max(jnp.abs(_dot(x, AsT) - z), axis=1, keepdims=True)
    rd = _dot(x, PsT_ref[:]) + q + _dot(y, As)
    rd_out[:] = jnp.max(jnp.abs(rd), axis=1, keepdims=True)


def admm_solve_pallas(spec: ADMMSpec, theta: jax.Array,
                      state: Optional[ADMMState] = None,
                      iters: int = 100,
                      block_b: int = 256,
                      interpret: bool = False) -> ADMMSolution:
    """Batch-explicit fused solve: ``theta`` is ``(B, ntheta)``, the state
    leaves are ``(B, n_p)`` / ``(B, m_p)``.  Returns a batched
    ``ADMMSolution`` (``z_primal`` ``(B, n_p)``, residuals ``(B,)``).

    Numerically identical iteration to ``qp.admm_solve`` (same warm-start
    semantics); parity is asserted in ``tests/test_qp_pallas.py``.
    """
    B, nt = theta.shape
    n_p = spec.Kinv.shape[0]
    m_p = spec.As.shape[0]
    dt = spec.Kinv.dtype
    theta = theta.astype(dt)

    if state is None:
        state = ADMMState(x=jnp.zeros((B, n_p), dt),
                          y=jnp.zeros((B, m_p), dt),
                          z=jnp.zeros((B, m_p), dt))

    # pad the batch to a whole number of tiles (f32 sublane multiple of 8)
    bt = max(8, min(block_b, ((B + 7) // 8) * 8))
    B_pad = ((B + bt - 1) // bt) * bt
    pad = B_pad - B

    def padb(a):
        return jnp.pad(a, ((0, pad), (0, 0))) if pad else a

    theta_p = padb(theta)
    x_p, y_p, z_p = padb(state.x), padb(state.y), padb(state.z)

    row = lambda v: v.reshape(1, -1)
    grid = (B_pad // bt,)

    tile = lambda cols: pl.BlockSpec((bt, cols), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    kernel = functools.partial(_admm_kernel, iters=iters)
    sig_alpha = jnp.stack([spec.sigma.astype(dt),
                           spec.alpha.astype(dt)]).reshape(1, 2)

    out_shape = (
        jax.ShapeDtypeStruct((B_pad, n_p), dt),   # x
        jax.ShapeDtypeStruct((B_pad, m_p), dt),   # y
        jax.ShapeDtypeStruct((B_pad, m_p), dt),   # z
        jax.ShapeDtypeStruct((B_pad, 1), dt),     # r_prim
        jax.ShapeDtypeStruct((B_pad, 1), dt),     # r_dual
    )
    # 3 matmuls/iter, HIGHEST precision ~ 6 bf16 passes
    flops_iter = 2 * bt * (m_p * n_p * 2 + n_p * n_p) * 6
    cost = pl.CostEstimate(
        flops=flops_iter * iters * grid[0],
        bytes_accessed=(B_pad * (n_p + 2 * m_p) * 2 + B_pad * nt) * 4,
        transcendentals=0)

    x_o, y_o, z_o, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # sigma, alpha
            tile(nt),                      # theta
            tile(n_p), tile(m_p), tile(m_p),   # x, y, z
            full((n_p, n_p)),              # Kinv^T
            full((m_p, n_p)),              # As
            full((n_p, m_p)),              # As^T
            full((n_p, n_p)),              # Ps^T
            full((nt, n_p)),               # Mq^T
            full((nt, m_p)),               # Ml^T
            full((nt, m_p)),               # Mu^T
            full((1, n_p)),                # q0
            full((1, m_p)), full((1, m_p)),    # l0, u0
            full((1, m_p)), full((1, m_p)),    # rho, rho_inv
        ],
        out_specs=(tile(n_p), tile(m_p), tile(m_p), tile(1), tile(1)),
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(sig_alpha, theta_p, x_p, y_p, z_p,
      spec.Kinv.T, spec.As, spec.As.T, spec.Ps.T,
      spec.Mq.T, spec.Ml.T, spec.Mu.T,
      row(spec.q0), row(spec.l0), row(spec.u0),
      row(spec.rho), row(spec.rho_inv))

    if pad:
        x_o, y_o, z_o = x_o[:B], y_o[:B], z_o[:B]
        rp, rd = rp[:B], rd[:B]

    return ADMMSolution(
        z_primal=x_o * spec.D[None, :],
        state=ADMMState(x=x_o, y=y_o, z=z_o),
        r_prim=rp[:, 0], r_dual=rd[:, 0])
