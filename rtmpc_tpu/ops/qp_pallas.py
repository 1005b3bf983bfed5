"""Fused batched ADMM QP solver as a Pallas TPU kernel.

``admm_solve`` (``qp.py``) expresses one OSQP-style iteration in jnp and is
vmapped over the batch; under XLA every iteration's intermediates round-trip
through HBM, so the solve runs at the HBM roofline.  This kernel instead
runs the ENTIRE fixed iteration budget VMEM-resident per batch tile: the
shared problem matrices are loaded into VMEM once per tile and the
per-instance iterates ``(x, y, z)`` never leave the chip until the final
state is written back.

The iteration is restructured for the MXU's pipeline (this is what makes
the kernel beat XLA rather than merely match it):

* the per-instance linear terms ``Kinv q`` / ``As Kinv q`` are hoisted out
  of the loop (computed once per tile),
* the per-iteration linear step uses the precomputed composites
  ``Gxx/Gsx/Gxz/Gsz`` (``prepare_admm``), so each iteration issues four
  INDEPENDENT matmuls instead of a 3-deep dependent chain — the MXU can
  overlap them, which matters at these tiny shapes (n ~ 40, m ~ 112,
  far below one 128x128 MXU tile).

Matmul precision follows ``ops/precision.py``: HIGHEST maps to the native
6-pass dot; HIGH is implemented manually as 3-pass bf16 (Mosaic rejects
``Precision.HIGH``), matching XLA's HIGH semantics.

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

from . import precision as _prec
from .qp import ADMMSpec, ADMMState, ADMMSolution

__all__ = ["admm_solve_pallas"]

_DIMS = (((1,), (0,)), ((), ()))


def _split_bf16(a):
    """bf16 (high, residual) decomposition of an f32 array."""
    a32 = a.astype(jnp.float32)
    ahi = a32.astype(jnp.bfloat16)
    alo = (a32 - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
    return ahi, alo


def _high() -> bool:
    return _prec._PRECISION != jax.lax.Precision.HIGHEST


def _dot(a, b):
    """Contraction at the solve-path precision (ops/precision.py).

    HIGHEST: native 6-pass (exact f32).  HIGH: manual 3-pass bf16 — Mosaic
    does not implement ``Precision.HIGH``, so split each operand into a
    bf16 high part and a bf16 residual and take the three leading products
    (hi*hi + hi*lo + lo*hi), exactly XLA's HIGH algorithm.
    """
    if not _high():
        return jax.lax.dot_general(
            a, b, dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    return _dot_split(_split_bf16(a), _split_bf16(b))


def _dot_split(ab, bb):
    """3-pass product of pre-split bf16 operand pairs (HIGH semantics);
    lets loop-invariant matrices be split ONCE outside the iteration."""
    ahi, alo = ab
    bhi, blo = bb

    def d(u, v):
        return jax.lax.dot_general(
            u, v, dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


def _dot_mat2(a_prep, mat_prep):
    """``a @ M`` on operands prepared by ``_prep_mat``/``_split_bf16``
    (pre-split pairs in HIGH mode, plain arrays in HIGHEST)."""
    if not _high():
        return jax.lax.dot_general(
            a_prep, mat_prep, dimension_numbers=_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    return _dot_split(a_prep, mat_prep)


def _prep_mat(m):
    return _split_bf16(m) if _high() else m


def _admm_kernel(alpha_ref, theta_ref, x_ref, y_ref, z_ref,
                 Gxc_ref, Gsc_ref, Kcat_ref,
                 As_ref, AsT_ref, PsT_ref,
                 MqT_ref, MlT_ref, MuT_ref,
                 q0_ref, l0_ref, u0_ref, rho_ref, rhoinv_ref,
                 x_out, y_out, z_out, rp_out, rd_out,
                 *, iters: int, n_p: int, m_p: int, nblk: int):
    alpha = alpha_ref[0, 0]
    # per-instance parameter vectors, built once per tile
    th = theta_ref[:]
    q = q0_ref[:] + _dot(th, MqT_ref[:])          # (BT, n)
    l = l0_ref[:] + _dot(th, MlT_ref[:])          # (BT, m)
    u = u0_ref[:] + _dot(th, MuT_ref[:])          # (BT, m)
    # qcat = [Kinv q | As Kinv q] in the two lane-aligned output slots
    qcat = _dot(q, Kcat_ref[:])                   # (BT, nblk + mblk)
    rho = rho_ref[:]                              # (1, m) broadcasts
    rho_inv = rhoinv_ref[:]
    # loop-invariant matrices: bf16-split ONCE (HIGH) outside the iteration
    Gxc = _prep_mat(Gxc_ref[:])                   # (n, nblk + mblk)
    Gsc = _prep_mat(Gsc_ref[:])                   # (m, nblk + mblk)

    def body(_, st):
        x, y, z = st
        s = rho * z - y
        xs = _split_bf16(x) if _high() else x
        ss = _split_bf16(s) if _high() else s
        # one wide matmul per operand: output slots [xt | zt], each
        # starting at a 128-lane boundary so the slices below are aligned
        t = _dot_mat2(xs, Gxc) + _dot_mat2(ss, Gsc) - qcat
        xt = t[:, :n_p]
        zt = t[:, nblk:nblk + m_p]
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
    rp_out[:] = jnp.max(jnp.abs(_dot(x, AsT_ref[:]) - z), axis=1,
                        keepdims=True)
    rd = _dot(x, PsT_ref[:]) + q + _dot(y, As_ref[:])
    rd_out[:] = jnp.max(jnp.abs(rd), axis=1, keepdims=True)


def admm_solve_pallas(spec: ADMMSpec, theta: jax.Array,
                      state: Optional[ADMMState] = None,
                      iters: int = 100,
                      block_b: int = 1024,
                      interpret: bool = False) -> ADMMSolution:
    """Batch-explicit fused solve: ``theta`` is ``(B, ntheta)``, the state
    leaves are ``(B, n_p)`` / ``(B, m_p)``.  Returns a batched
    ``ADMMSolution`` (``z_primal`` ``(B, n_p)``, residuals ``(B,)``).

    Numerically equivalent iteration to ``qp.admm_solve`` (same warm-start
    semantics, composite matrices formed in f64 at preparation); parity is
    asserted in ``tests/test_qp_pallas.py`` and, compiled on hardware, by
    ``tools/bench_pallas_kernel.py`` / the rollout parity gates.
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

    # wide composites with 128-lane-aligned [xt | zt] output slots,
    # precomputed in f64 by prepare_admm
    nm = spec.Gxc.shape[1]
    LANE = 128
    nblk = ((n_p + LANE - 1) // LANE) * LANE

    kernel = functools.partial(_admm_kernel, iters=iters,
                               n_p=n_p, m_p=m_p, nblk=nblk)
    alpha = spec.alpha.astype(dt).reshape(1, 1)

    out_shape = (
        jax.ShapeDtypeStruct((B_pad, n_p), dt),   # x
        jax.ShapeDtypeStruct((B_pad, m_p), dt),   # y
        jax.ShapeDtypeStruct((B_pad, m_p), dt),   # z
        jax.ShapeDtypeStruct((B_pad, 1), dt),     # r_prim
        jax.ShapeDtypeStruct((B_pad, 1), dt),     # r_dual
    )
    # 4 matmuls/iter; HIGHEST ~ 6 bf16 passes, HIGH ~ 3
    passes = 6 if _prec._PRECISION == jax.lax.Precision.HIGHEST else 3
    flops_iter = 2 * bt * (n_p + m_p) * (n_p + m_p) * passes
    cost = pl.CostEstimate(
        flops=flops_iter * iters * grid[0],
        bytes_accessed=(B_pad * (n_p + 2 * m_p) * 2 + B_pad * nt) * 4,
        transcendentals=0)

    x_o, y_o, z_o, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),   # tiles are independent
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # alpha
            tile(nt),                      # theta
            tile(n_p), tile(m_p), tile(m_p),   # x, y, z
            full((n_p, nm)),               # Gxc
            full((m_p, nm)),               # Gsc
            full((n_p, nm)),               # Kcat
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
    )(alpha, theta_p, x_p, y_p, z_p,
      spec.Gxc, spec.Gsc, spec.Kcat,
      spec.As, spec.As.T, spec.Ps.T,
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
