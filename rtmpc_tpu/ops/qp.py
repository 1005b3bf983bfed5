"""Batched OSQP-style ADMM solver for the canonical MPC box-QP (JAX).

Replaces the reference's per-step CVXPY/Clarabel interior-point solves
(``prob.solve(solver=cp.CLARABEL, tol_gap_abs=1e-7)`` at
``TubeTrackingMPC.py:183``) with a solver designed for the TPU execution
model:

* **One factorization per problem structure.** All per-step QPs share the
  quadratic form and constraint matrix; only ``q``/``l``/``u`` depend on the
  parameters ``theta = [x_init; ref]``.  The ADMM KKT matrix
  ``K = P + sigma I + A' diag(rho) A`` is inverted once on the host in
  float64 and shipped to the device, so the per-iteration linear solve is a
  single dense matmul — exactly what the MXU wants.
* **Batched by construction.** ``admm_solve`` is written for one problem and
  ``vmap``s to thousands of parameter instances; the iteration then consists
  of ``(B, n) @ (n, n)`` / ``(B, n) @ (n, m)`` matmuls plus elementwise
  projections.
* **Static shapes.** Problems are padded to lane-friendly sizes at
  preparation time; a fixed iteration count keeps the step function
  scan-compatible (no data-dependent control flow).
* **Warm starting.** The (x, y, z) iterates are part of the rollout carry:
  consecutive closed-loop QPs are near-identical, so warm starts cut the
  iteration count dramatically.

Accuracy strategy (SURVEY.md section 7.3 item 1): modified Ruiz
equilibration + cost scaling at preparation, over-relaxation alpha=1.6,
per-row rho with stiff equality rows (OSQP heuristic), and an optional
active-set polish pass (``admm_solve(..., polish=True)``) that recovers
near-oracle accuracy from a loosely converged iterate.
Closed-loop contraction then forgives the residual solver error; parity is
asserted on trajectories, not raw QP iterates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .assembly import QPTemplate
from .precision import mm

__all__ = ["ADMMSpec", "ADMMState", "ADMMSolution", "prepare_admm",
           "init_admm_state", "admm_solve", "admm_solve_batch_T"]


class ADMMSpec(NamedTuple):
    """Device-resident, padded, pre-scaled problem data (pytree of arrays).

    Shapes: n_p (padded vars), m_p (padded rows), ntheta parameters.
    """
    Kinv: jax.Array      # (n_p, n_p) inverse of P_s + sigma I + A_s' rho A_s
    Ps: jax.Array        # (n_p, n_p) scaled quadratic cost
    As: jax.Array        # (m_p, n_p) scaled constraint matrix
    rho: jax.Array       # (m_p,)
    rho_inv: jax.Array   # (m_p,)
    q0: jax.Array        # (n_p,) scaled
    Mq: jax.Array        # (n_p, ntheta) scaled
    l0: jax.Array        # (m_p,) scaled (-big for one-sided)
    Ml: jax.Array        # (m_p, ntheta)
    u0: jax.Array        # (m_p,)
    Mu: jax.Array        # (m_p, ntheta)
    D: jax.Array         # (n_p,) primal unscaling diag
    E: jax.Array         # (m_p,) row scaling diag
    cinv: jax.Array      # scalar: 1/cost-scale (dual unscaling)
    sigma: jax.Array     # scalar
    alpha: jax.Array     # scalar over-relaxation
    # Composite iteration matrices for the fused (Pallas) path, formed in
    # float64 at preparation.  With s = rho*z - y the ADMM linear step is
    #   xt = Kinv (sigma x - q + As' s),   zt = As xt
    # so per iteration  [xt | zt] = x Gxc + s Gsc - q Kcat : two wide
    # INDEPENDENT matmuls (vs a 3-deep dependent chain), with the q-terms
    # hoisted out of the loop entirely.  The xt/zt output slots start at
    # 128-lane boundaries (``_LANE``) so in-kernel slices are aligned.
    Gxc: jax.Array       # (n_p, nblk+mblk)  [x-slot: (sigma Kinv)' | (As sigma Kinv)']
    Gsc: jax.Array       # (m_p, nblk+mblk)  [(Kinv As')' | (As Kinv As')']
    Kcat: jax.Array      # (n_p, nblk+mblk)  [Kinv' | Kinv' As']


class ADMMState(NamedTuple):
    """Warm-startable iterate (scaled space)."""
    x: jax.Array         # (n_p,)
    y: jax.Array         # (m_p,)
    z: jax.Array         # (m_p,)


class ADMMSolution(NamedTuple):
    z_primal: jax.Array  # (n_p,) UNSCALED primal solution (padded tail ~0)
    state: ADMMState     # final iterate for warm starting
    r_prim: jax.Array    # scalar inf-norm primal residual (scaled)
    r_dual: jax.Array    # scalar inf-norm dual residual (scaled)


def _ruiz_equilibrate(P, A, q_cols, iters=15):
    """Modified Ruiz equilibration on [[P, A'], [A, 0]] + cost scaling.

    Returns (Ps, As, D, E, c) with Ps = c D P D, As = E A D.
    q_cols is the (n, k) matrix of linear-term columns used for the cost
    scaling heuristic (OSQP uses the mean of |D q|).
    """
    n, m = P.shape[0], A.shape[0]
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, As = P.copy(), A.copy()
    qc = q_cols.copy()  # running scaled linear-term columns: c * D * q_cols
    for _ in range(iters):
        # column norms over the stacked KKT columns (vars), row norms (rows)
        col = np.maximum(np.abs(Ps).max(axis=0), np.abs(As).max(axis=0)
                         if m else 0.0)
        col[col == 0] = 1.0
        d = 1.0 / np.sqrt(col)
        row = np.abs(As).max(axis=1) if m else np.ones(0)
        row[row == 0] = 1.0
        e = 1.0 / np.sqrt(row)
        Ps = (Ps * d[None, :]) * d[:, None]
        As = (As * d[None, :]) * e[:, None]
        D *= d
        E *= e
        qc = qc * d[:, None]
        # cost scaling (OSQP): gamma from the CURRENT scaled cost, applied
        # to both the quadratic and linear parts so it converges to 1
        pcol = np.abs(Ps).max(axis=0)
        qn = np.abs(qc).max() if qc.size else 0.0
        gamma = 1.0 / max(np.mean(pcol), max(qn, 1e-6))
        gamma = min(max(gamma, 1e-6), 1e6)
        Ps *= gamma
        qc *= gamma
        c *= gamma
    return Ps, As, D, E, c


def _admm_numpy_trial(Ps, As, q, l, u, rho_vec, sigma, alpha, iters):
    """Host NumPy ADMM (same iteration as the device path) for rho tuning."""
    n, m = Ps.shape[0], As.shape[0]
    K = Ps + sigma * np.eye(n) + (As.T * rho_vec) @ As
    try:
        Kinv = np.linalg.inv(K)
    except np.linalg.LinAlgError:
        return np.inf
    x = np.zeros(n)
    y = np.zeros(m)
    z = np.zeros(m)
    for _ in range(iters):
        rhs = sigma * x - q + As.T @ (rho_vec * z - y)
        xt = Kinv @ rhs
        zt = As @ xt
        x = alpha * xt + (1 - alpha) * x
        z_mix = alpha * zt + (1 - alpha) * z
        z_new = np.clip(z_mix + y / rho_vec, l, u)
        y = y + rho_vec * (z_mix - z_new)
        z = z_new
    r_p = np.max(np.abs(As @ x - z))
    r_d = np.max(np.abs(Ps @ x + q + As.T @ y))
    return max(r_p, r_d)


def prepare_admm(
    template: QPTemplate,
    rho="auto",
    rho_eq_scale: float = 1e3,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    pad_to: int = 8,
    dtype=jnp.float32,
    equilibrate: bool = True,
    big: float = 1e20,
    probe_thetas: Optional[np.ndarray] = None,
    rho_candidates=(0.5, 2.0, 5.0, 15.0, 50.0, 200.0),
    tune_iters: int = 150,
    rho2_scale: Optional[float] = None,
) -> ADMMSpec:
    """Host-side preparation: equilibrate, build K^{-1} in float64, pad, cast.

    ``pad_to``: round n and m up to this multiple (use 128/256 on TPU for
    MXU-tile alignment; 8 is fine for CPU tests).

    ``rho="auto"``: select the penalty from ``rho_candidates`` by running a
    short NumPy ADMM trial per candidate on ``probe_thetas`` (representative
    parameter vectors; zeros if not given) and keeping the one with the
    smallest worst-case KKT residual.  A well-chosen fixed rho converges
    10-100x faster than OSQP's default here (dense, equilibrated, tiny MPC
    problems), and a fixed rho is what lets K^{-1} be precomputed once.

    ``rho2_scale``: when set, returns a PAIR ``(spec1, spec2)`` sharing one
    equilibration, where ``spec2`` has every rho scaled by this factor and
    its own K^{-1}/composites — the second phase of a two-phase rho
    schedule.  Measured on the flagship tracking QP (host f64,
    warm-started closed-loop sequence): phase 1 at the tuned rho drives
    the primal/active set, phase 2 at rho/10 lets the dual converge —
    100+100 iterations reach 1.2e-4 max solution error where fixed-rho
    300 iterations reach only 8.4e-3.  The iterates (x, y, z) are
    rho-independent quantities, so the phase switch (and the next step's
    warm start) is just a state handoff, exactly like OSQP's rho updates.
    """
    P, A = template.P, template.A
    n, m = template.n, template.m

    qcols = np.column_stack([template.q0.reshape(-1, 1), template.Mq]) \
        if template.Mq.size else template.q0.reshape(-1, 1)
    if equilibrate:
        Ps, As, D, E, c = _ruiz_equilibrate(P, A, qcols)
    else:
        Ps, As, D, E, c = P.copy(), A.copy(), np.ones(n), np.ones(m), 1.0

    if rho == "auto":
        if probe_thetas is None:
            rng = np.random.default_rng(0)
            probe_thetas = np.vstack([
                np.zeros((1, template.ntheta)),
                rng.uniform(-2.0, 2.0, size=(3, template.ntheta)),
            ])
        probe_thetas = np.atleast_2d(probe_thetas)
        best_rho, best_score = rho_candidates[0], np.inf
        for cand in rho_candidates:
            rv = np.where(template.is_eq, cand * rho_eq_scale, cand)
            score = 0.0
            for th in probe_thetas:
                q_s = c * D * (template.q0 + template.Mq @ th)
                l_s = E * np.where(np.isfinite(template.l0),
                                   template.l0 + template.Ml @ th, -big)
                u_s = E * np.where(np.isfinite(template.u0),
                                   template.u0 + template.Mu @ th, big)
                score = max(score, _admm_numpy_trial(
                    Ps, As, q_s, l_s, u_s, rv, sigma, alpha, tune_iters))
            if score < best_score:
                best_rho, best_score = cand, score
        rho = best_rho

    rho_vec = np.where(template.is_eq, rho * rho_eq_scale, rho)

    # scaled parametrized vectors
    q0s = c * D * template.q0
    Mqs = c * D[:, None] * template.Mq
    l0s = E * np.where(np.isfinite(template.l0), template.l0, -big / np.maximum(E, 1e-30))
    u0s = E * np.where(np.isfinite(template.u0), template.u0, big / np.maximum(E, 1e-30))
    Mls = E[:, None] * template.Ml
    Mus = E[:, None] * template.Mu

    # padding
    def rup(v, k):
        return ((v + k - 1) // k) * k

    n_p, m_p = rup(n, pad_to), rup(m, pad_to)

    def padm(M, r, cdim):
        out = np.zeros((r, cdim))
        out[:M.shape[0], :M.shape[1]] = M
        return out

    def padv(v, r, fill=0.0):
        out = np.full(r, fill)
        out[:v.shape[0]] = v
        return out

    Ps_p = padm(Ps, n_p, n_p)
    np.fill_diagonal(Ps_p[n:, n:], 1.0)
    As_p = padm(As, m_p, n_p)

    def phase_spec(rv, rho_fill):
        """Everything that depends on the rho vector: K^{-1} (float64) and
        the fused-path composites; xt/zt output slots are placed at
        128-lane boundaries for the TPU kernel."""
        K = Ps + sigma * np.eye(n) + (As.T * rv) @ As
        Kinv = np.linalg.inv(K)
        Kinv_p = padm(Kinv, n_p, n_p)
        np.fill_diagonal(Kinv_p[n:, n:], 1.0 / (1.0 + sigma))
        rho_p = padv(rv, m_p, fill=rho_fill)

        _LANE = 128
        nblk = ((n_p + _LANE - 1) // _LANE) * _LANE
        mblk = ((m_p + _LANE - 1) // _LANE) * _LANE
        M1 = sigma * Kinv_p                    # (n_p, n_p)
        M2 = Kinv_p @ As_p.T                   # (n_p, m_p)

        def cat_slots(Mx, Mz):
            out = np.zeros((Mx.shape[0], nblk + mblk))
            out[:, :n_p] = Mx
            out[:, nblk:nblk + m_p] = Mz
            return out

        Gxc = cat_slots(M1.T, (As_p @ M1).T)
        Gsc = cat_slots(M2.T, (As_p @ M2).T)
        Kcat = cat_slots(Kinv_p.T, Kinv_p.T @ As_p.T)

        return ADMMSpec(
            Kinv=jnp.asarray(Kinv_p, dtype),
            Ps=jnp.asarray(Ps_p, dtype),
            As=jnp.asarray(As_p, dtype),
            rho=jnp.asarray(rho_p, dtype),
            rho_inv=jnp.asarray(1.0 / rho_p, dtype),
            q0=jnp.asarray(padv(q0s, n_p), dtype),
            Mq=jnp.asarray(padm(Mqs, n_p, template.ntheta), dtype),
            l0=jnp.asarray(padv(l0s, m_p, fill=-1.0), dtype),
            Ml=jnp.asarray(padm(Mls, m_p, template.ntheta), dtype),
            u0=jnp.asarray(padv(u0s, m_p, fill=1.0), dtype),
            Mu=jnp.asarray(padm(Mus, m_p, template.ntheta), dtype),
            D=jnp.asarray(padv(D, n_p, fill=1.0), dtype),
            E=jnp.asarray(padv(E, m_p, fill=1.0), dtype),
            cinv=jnp.asarray(1.0 / c, dtype),
            sigma=jnp.asarray(sigma, dtype),
            alpha=jnp.asarray(alpha, dtype),
            Gxc=jnp.asarray(Gxc, dtype),
            Gsc=jnp.asarray(Gsc, dtype),
            Kcat=jnp.asarray(Kcat, dtype),
        )

    spec = phase_spec(rho_vec, rho)
    if rho2_scale is None:
        return spec
    spec2 = phase_spec(rho_vec * rho2_scale, rho * rho2_scale)
    return spec, spec2


def init_admm_state(spec: ADMMSpec) -> ADMMState:
    n_p = spec.Kinv.shape[0]
    m_p = spec.As.shape[0]
    dt = spec.Kinv.dtype
    return ADMMState(x=jnp.zeros(n_p, dt), y=jnp.zeros(m_p, dt),
                     z=jnp.zeros(m_p, dt))


def _admm_body(spec: ADMMSpec, q, l, u, precision=None):
    """One OSQP-ADMM iteration as a closure over the instance vectors
    (shared by the solve loop and the certificate delta probe).

    ``precision``: optional per-phase matmul precision override
    (``jax.lax.Precision`` or the strings "default"/"high"/"highest");
    ``None`` uses the module-wide solve-path precision (``precision.mm``).
    """
    sigma, alpha = spec.sigma, spec.alpha
    if precision is None:
        mmp = mm
    else:
        if isinstance(precision, str):
            precision = {"default": jax.lax.Precision.DEFAULT,
                         "high": jax.lax.Precision.HIGH,
                         "highest": jax.lax.Precision.HIGHEST}[precision]
        def mmp(a, b, _p=precision):
            return jnp.matmul(a, b, precision=_p)

    def body(s: ADMMState) -> ADMMState:
        x, y, z = s
        rhs = sigma * x - q + mmp(spec.As.T, spec.rho * z - y)
        xt = mmp(spec.Kinv, rhs)
        zt = mmp(spec.As, xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_mix + y * spec.rho_inv, l, u)
        y_new = y + spec.rho * (z_mix - z_new)
        return ADMMState(x_new, y_new, z_new)

    return body


def admm_solve(spec: ADMMSpec, theta: jax.Array,
               state: Optional[ADMMState] = None,
               iters: int = 100,
               polish: bool = False,
               polish_weight: Optional[float] = None,
               active_tol: float = 1e-6,
               early_tol: Optional[float] = None,
               early_dual_factor: float = 25.0,
               check_every: int = 25,
               precision=None) -> ADMMSolution:
    """Solve one parameter instance; ``jax.vmap`` over ``theta``/``state``
    for batches.  Fixed iteration count (scan/jit friendly).

    ``early_tol``: residual-based early exit — iterate in chunks of
    ``check_every`` and stop once the scaled primal residual inf-norm
    drops below ``early_tol`` AND the dual below
    ``early_tol * early_dual_factor`` (or the ``iters`` budget runs out).
    The asymmetry is measured, not stylistic: on TPU f32/bf16-3-pass the
    ADMM iterate's dual residual floors at ~1.5e-3 (iteration arithmetic
    noise, verified identical under HIGHEST-precision re-measurement)
    while the primal keeps falling to ~5e-6, so a symmetric tolerance
    below the dual floor can never fire.  Warm-started closed-loop steps
    typically exit after 1-3 chunks while cold/jump steps use the full
    budget, recovering most of the fixed-count throughput loss at
    unchanged worst-case accuracy.  Under ``vmap`` the ``while_loop``
    batches to run-until-all-lanes-converge with per-lane masking, so a
    batch advances at the pace of its slowest element (on TPU the loop is
    a true dynamic-trip-count XLA While).

    ``polish=True`` runs an OSQP-style solution polish after the ADMM loop:
    detect the active constraint set from the final iterate, then solve the
    corresponding equality-constrained QP via a penalty formulation
    ``(P + sigma I + w A_act' A_act) x = -q + w A_act' b_act`` with one
    iterative-refinement sweep.  This recovers Clarabel-class (1e-8..1e-10)
    accuracy from a loosely converged ADMM iterate when the active set is
    identified correctly; if the polished KKT residual is worse than the
    ADMM one, the ADMM solution is kept (per-element select)."""
    if state is None:
        state = init_admm_state(spec)
    theta = theta.astype(spec.q0.dtype)
    q = spec.q0 + mm(spec.Mq, theta)
    l = spec.l0 + mm(spec.Ml, theta)
    u = spec.u0 + mm(spec.Mu, theta)

    body = _admm_body(spec, q, l, u, precision=precision)
    if early_tol is None:
        state = jax.lax.fori_loop(0, iters, lambda _, s: body(s), state)
    else:
        tol = jnp.asarray(early_tol, spec.q0.dtype)
        tol_d = jnp.asarray(early_tol * early_dual_factor, spec.q0.dtype)

        def _residuals_ok(s: ADMMState):
            rp = jnp.max(jnp.abs(mm(spec.As, s.x) - s.z))
            rd = jnp.max(jnp.abs(mm(spec.Ps, s.x) + q
                                 + mm(spec.As.T, s.y)))
            return jnp.logical_and(rp < tol, rd < tol_d)

        def cond(c):
            _, it, done = c
            return jnp.logical_and(~done, it < iters)

        def wbody(c):
            s, it, _ = c
            s = jax.lax.fori_loop(0, check_every, lambda _, t: body(t), s)
            return (s, it + check_every, _residuals_ok(s))

        state, _, _ = jax.lax.while_loop(
            cond, wbody,
            (state, jnp.zeros((), jnp.int32), jnp.asarray(False)))

    x, y, z = state

    r_prim, r_dual = (jnp.max(jnp.abs(mm(spec.As, x) - z)),
                      jnp.max(jnp.abs(mm(spec.Ps, x) + q
                                      + mm(spec.As.T, y))))

    if polish:
        del polish_weight   # kept in the signature for API stability
        x, r_prim, r_dual = polish_solution(
            spec, q, l, u, x, y, z, r_prim, r_dual, active_tol=active_tol)
        # NOTE: ``state`` keeps the raw ADMM iterate — the polished duals
        # live on a different active-set manifold and would poison the next
        # solve's warm start; only the returned primal is polished.

    return ADMMSolution(z_primal=spec.D * x, state=state,
                        r_prim=r_prim, r_dual=r_dual)


def admm_solve_batch_T(spec: ADMMSpec, theta_b: jax.Array,
                       state_b: Optional[ADMMState] = None,
                       iters: int = 100,
                       precision=None) -> ADMMSolution:
    """Batch-level ADMM with the batch in the MXU LANE dimension.

    The vmapped path runs each iteration GEMM as (B,m)x(m,n): contraction
    and output dims are the tiny problem sizes, each padded to 128 lanes,
    so only ~20% of the streamed MACs are useful on the flagship geometry
    — the measured MXU-padding bound (``parallel/roofline.py``; BENCH_r04
    ``roofline_bound: mxu_padded_tiles`` at ``mxu_padded_util`` ~1.0).
    Here the state is carried TRANSPOSED — X:(n_p, B), Y/Z:(m_p, B), the
    problem matrices multiply from the LEFT — so the lane dimension is the
    batch (no padding waste for B >= 128) and n/m pad only as contraction
    lanes / output sublanes: the useful-MAC ceiling roughly doubles.

    Same algorithm, same contraction lengths, same fixed iteration count
    as ``admm_solve`` — results match the vmapped path to f32 roundoff.
    Accepts and returns the vmapped (batch-major, (B, .) leaves) layout so
    it is a drop-in replacement inside the batched rollout; the boundary
    transposes are amortized over ``iters``.

    No polish / early-exit / certificate plumbing here: polish is a
    per-element LU (vmapped around this call when enabled), early exit is
    a measured negative on TPU (ACCURACY.md), and certificates probe the
    returned state exactly as for the other paths.
    """
    dt = spec.q0.dtype
    theta_b = jnp.asarray(theta_b, dt)
    B = theta_b.shape[0]
    if state_b is None:
        n_p, m_p = spec.Kinv.shape[0], spec.As.shape[0]
        state_b = ADMMState(x=jnp.zeros((B, n_p), dt),
                            y=jnp.zeros((B, m_p), dt),
                            z=jnp.zeros((B, m_p), dt))
    if precision is None:
        mmp = mm
    else:
        if isinstance(precision, str):
            precision = {"default": jax.lax.Precision.DEFAULT,
                         "high": jax.lax.Precision.HIGH,
                         "highest": jax.lax.Precision.HIGHEST}[precision]

        def mmp(a, b, _p=precision):
            return jnp.matmul(a, b, precision=_p)

    # parameter maps once per solve; (row-major GEMMs, then transpose)
    qT = (spec.q0[None, :] + mmp(theta_b, spec.Mq.T)).T    # (n_p, B)
    lT = (spec.l0[None, :] + mmp(theta_b, spec.Ml.T)).T    # (m_p, B)
    uT = (spec.u0[None, :] + mmp(theta_b, spec.Mu.T)).T
    X, Y, Z = state_b.x.T, state_b.y.T, state_b.z.T
    sigma, alpha = spec.sigma, spec.alpha
    rho = spec.rho[:, None]
    rho_inv = spec.rho_inv[:, None]

    def body(_, s):
        X, Y, Z = s
        rhs = sigma * X - qT + mmp(spec.As.T, rho * Z - Y)
        Xt = mmp(spec.Kinv, rhs)
        Zt = mmp(spec.As, Xt)
        Xn = alpha * Xt + (1.0 - alpha) * X
        Zmix = alpha * Zt + (1.0 - alpha) * Z
        Zn = jnp.clip(Zmix + Y * rho_inv, lT, uT)
        Yn = Y + rho * (Zmix - Zn)
        return (Xn, Yn, Zn)

    X, Y, Z = jax.lax.fori_loop(0, iters, body, (X, Y, Z))
    r_prim = jnp.max(jnp.abs(mm(spec.As, X) - Z), axis=0)
    r_dual = jnp.max(jnp.abs(mm(spec.Ps, X) + qT + mm(spec.As.T, Y)),
                     axis=0)
    return ADMMSolution(z_primal=spec.D[None, :] * X.T,
                        state=ADMMState(X.T, Y.T, Z.T),
                        r_prim=r_prim, r_dual=r_dual)


def infeasibility_certificates(spec: ADMMSpec, theta, state: ADMMState,
                               eps_pinf: float = 1e-3,
                               eps_dinf: float = 1e-3,
                               k: int = 25,
                               big: float = 1e19):
    """OSQP primal/dual infeasibility certificates from the ADMM deltas.

    Replaces the hand-tuned residual threshold the engine used in round 1
    with the principled test SURVEY.md section 7.3.3 prescribes
    (Banjac/Goulart/Stellato/Boyd 2019, as implemented by OSQP): on an
    infeasible problem the ADMM iterates diverge along a certificate ray —
    the per-iteration deltas (dx, dy) converge to it.  OSQP samples the
    one-iteration delta every ``check_termination`` iterations of a long
    adaptive run; a fixed-budget solve gets one shot, so instead this runs
    ``k`` extra iterations from the final state and uses the AVERAGED
    deltas ``(state_{+k} - state) / k`` — the transient (and the
    over-relaxation oscillation) averages out while the ray component is
    preserved, which measured ~2.5x cleaner per-row sign purity at 400
    iterations on the cartpole tracking QP than the single-step delta.

    Primal infeasibility (dy certificate of an empty feasible set):
        ||A' dy||_inf <= eps * ||dy||_inf   and
        u' max(dy, 0) + l' min(dy, 0) <= -eps * ||dy||_inf
    Dual infeasibility (dx certificate of an unbounded objective):
        ||P dx||_inf <= eps ||dx||_inf,   q' dx <= -eps ||dx||_inf, and
        A dx within the recession cone of [l, u] (rows with finite bounds
        require |(A dx)_i| <= eps ||dx||_inf).

    Tests run in the SCALED space (certificates are scale-invariant up to
    the tolerance; this matches OSQP's own implementation).  Returns
    ``(prim_infeas, dual_infeas)`` booleans; vmap over (theta, state) for
    batches.  Mirrors the reference arm-stopping semantics driven by
    Clarabel's status at ``results_linear_system.py:262-271``.
    """
    theta = theta.astype(spec.q0.dtype)
    q = spec.q0 + mm(spec.Mq, theta)
    l = spec.l0 + mm(spec.Ml, theta)
    u = spec.u0 + mm(spec.Mu, theta)

    body = _admm_body(spec, q, l, u)
    x, y, z = state
    x_new, y_new, _ = jax.lax.fori_loop(0, k, lambda _, s: body(s), state)

    kf = jnp.asarray(float(k), x.dtype)
    dx = (x_new - x) / kf
    dy = (y_new - y) / kf
    dy_norm = jnp.max(jnp.abs(dy))
    dx_norm = jnp.max(jnp.abs(dx))
    tiny = jnp.asarray(1e-30, x.dtype)

    # primal-infeasibility test on dy
    Atdy = jnp.max(jnp.abs(mm(spec.As.T, dy)))
    # inf bounds contribute 0 when the matching dual sign is excluded;
    # mask them rather than multiplying inf * 0
    up = jnp.where(jnp.isfinite(u) & (jnp.abs(u) < big), u, 0.0)
    lo = jnp.where(jnp.isfinite(l) & (jnp.abs(l) < big), l, 0.0)
    sup = jnp.sum(up * jnp.maximum(dy, 0.0) + lo * jnp.minimum(dy, 0.0))
    ok_ray = jnp.max(jnp.abs(jnp.where(
        (~jnp.isfinite(u)) | (jnp.abs(u) >= big), jnp.maximum(dy, 0.0),
        0.0))) <= eps_pinf * jnp.maximum(dy_norm, tiny)
    ok_ray &= jnp.max(jnp.abs(jnp.where(
        (~jnp.isfinite(l)) | (jnp.abs(l) >= big), jnp.minimum(dy, 0.0),
        0.0))) <= eps_pinf * jnp.maximum(dy_norm, tiny)
    prim_infeas = (dy_norm > tiny) \
        & (Atdy <= eps_pinf * dy_norm) \
        & (sup <= -eps_pinf * dy_norm) \
        & ok_ray

    # dual-infeasibility test on dx
    Pdx = jnp.max(jnp.abs(mm(spec.Ps, dx)))
    qdx = jnp.dot(q, dx)
    Adx = mm(spec.As, dx)
    fin = jnp.isfinite(u) & (jnp.abs(u) < big) \
        & jnp.isfinite(l) & (jnp.abs(l) < big)
    cone_ok = jnp.max(jnp.abs(jnp.where(fin, Adx, 0.0))) \
        <= eps_dinf * jnp.maximum(dx_norm, tiny)
    dual_infeas = (dx_norm > tiny) \
        & (Pdx <= eps_dinf * dx_norm) \
        & (qdx <= -eps_dinf * dx_norm) \
        & cone_ok

    return prim_infeas, dual_infeas


def polish_solution(spec: ADMMSpec, q, l, u, x, y, z, r_prim, r_dual,
                    active_tol: float = 1e-6):
    """OSQP-style active-set polish of one (scaled) ADMM iterate.

    Returns ``(x, r_prim, r_dual)`` — the polished primal (kept only if its
    KKT residual beats the input's) and its residuals.  Shared by the
    vmapped-XLA path (``admm_solve(..., polish=True)``) and the fused
    Pallas path (which polishes per element after the kernel).
    """
    dt = x.dtype
    n_p = x.shape[0]
    m_p = spec.As.shape[0]

    def kkt_res(xv, yv):
        Axv = mm(spec.As, xv)
        rp = jnp.max(jnp.abs(jnp.clip(Axv, l, u) - Axv))
        rd = jnp.max(jnp.abs(mm(spec.Ps, xv) + q + mm(spec.As.T, yv)))
        return rp, rd
    # Active set from the final iterate: bound proximity or dual signal.
    # The proximity threshold must scale with the accuracy the ADMM
    # actually reached — a loosely converged f32 iterate sits ~r_prim
    # away from its active bounds, so a fixed 1e-6 window detects
    # nothing (and the polish silently never fires).
    act_tol_z = jnp.maximum(10.0 * jnp.maximum(r_prim, r_dual),
                            jnp.asarray(active_tol, dt))
    act_tol_y = 1e-3 * jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    near_u = (u - z) < act_tol_z
    near_l = (z - l) < act_tol_z
    act = jnp.logical_or(jnp.logical_or(near_u, near_l),
                         jnp.abs(y) > act_tol_y)
    # pick the bound: proximity first, dual sign as tie-breaker
    b_act = jnp.where(y < 0, l, u)
    b_act = jnp.where(near_l & ~near_u, l, b_act)
    b_act = jnp.where(near_u & ~near_l, u, b_act)
    is_eq = jnp.abs(u - l) < active_tol
    # Direct regularized KKT solve on the (masked) active set — OSQP's
    # polish, made static-shape: inactive rows are replaced by
    # ``-y_i = 0`` identity rows instead of being dropped.
    #   [ Ps + sx I   (D As)' ] [x]   [ -q      ]
    #   [ D As   -(sy D+(1-D))] [y] = [ D b_act ]
    # A *direct* solve gives the duals without the w-amplified noise of
    # a penalty formulation (which caps f32 dual accuracy at ~1e-2).
    eps = jnp.finfo(dt).eps
    sig_x = jnp.asarray(eps * 100, dt)
    sig_y = jnp.asarray(eps * 100, dt)   # guards redundant active rows

    def kkt_solve(act_k, b_k):
        d = act_k.astype(dt)
        Ad = spec.As * d[:, None]
        K = jnp.zeros((n_p + m_p, n_p + m_p), dt)
        K = K.at[:n_p, :n_p].set(
            spec.Ps + sig_x * jnp.eye(n_p, dtype=dt))
        K = K.at[:n_p, n_p:].set(Ad.T)
        K = K.at[n_p:, :n_p].set(Ad)
        K = K.at[n_p:, n_p:].set(jnp.diag(-(sig_y * d + (1.0 - d))))
        rhs = jnp.concatenate([-q, d * b_k])
        lu, piv = jax.scipy.linalg.lu_factor(K)
        s = jax.scipy.linalg.lu_solve((lu, piv), rhs)
        for _ in range(2):     # iterative refinement
            s = s + jax.scipy.linalg.lu_solve((lu, piv),
                                              rhs - mm(K, s))
        return s[:n_p], s[n_p:] * d

    xp, yp = kkt_solve(act, b_act)
    # Active-set refinement: drop rows whose multiplier has the wrong
    # sign (falsely pinned), add rows the polished point violates, then
    # re-solve.  A few passes settle all but pathological degeneracies.
    for _ in range(3):
        wrong_sign = jnp.where(b_act == u, yp < -active_tol,
                               yp > active_tol) & ~is_eq
        Axp = mm(spec.As, xp)
        viol_u = Axp > u + active_tol
        viol_l = Axp < l - active_tol
        act = (act & ~wrong_sign) | viol_u | viol_l | is_eq
        b_act = jnp.where(viol_l, l, b_act)
        b_act = jnp.where(viol_u, u, b_act)
        xp, yp = kkt_solve(act, b_act)
    rp_p, rd_p = kkt_res(xp, yp)
    better = jnp.maximum(rp_p, rd_p) < jnp.maximum(r_prim, r_dual)
    x = jnp.where(better, xp, x)
    r_prim = jnp.where(better, rp_p, r_prim)
    r_dual = jnp.where(better, rd_p, r_dual)
    return x, r_prim, r_dual
