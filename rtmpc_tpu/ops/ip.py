"""Batched dense Mehrotra interior-point QP solver (JAX, fixed iterations).

The accuracy-mode companion to the ADMM solver in ``ops/qp.py``.  ADMM with
a precomputed factorization is the throughput king for warm-started
closed-loop streams, but it converges slowly on a small set of pathological
instances (thin-sliver feasible sets when the estimate leaves the tightened
constraint box, invalidated warm starts at reference reversals, strongly
anisotropic costs).  This solver is the same algorithm class as Clarabel
(the reference's solver, ``RegulatorMPC.py:31``): a primal-dual
predictor-corrector method that reaches 1e-8-class KKT residuals in ~20
iterations on *every* instance — at the price of one dense factorization
per instance per iteration (fine for these tiny MPC problems; the
factorized matrix is (n + m_eq)^2 with n <= ~130).

Same parametrization as the ADMM path: q/l/u affine in
theta = [x_init; ref]; fully vmappable; fixed iteration count for scan/jit.

Problem form (from ``QPTemplate``)::

    minimize   0.5 x' P x + q(theta)' x
    subject to A_e x = b(theta)                    (equality rows)
               lo(theta) <= A_i x <= up(theta)     (box rows, may be one-sided)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .assembly import QPTemplate
from .precision import mm

__all__ = ["IPSpec", "prepare_ip", "ip_solve", "IPSolution"]


class IPSpec(NamedTuple):
    """Device pytree of the parametrized IP problem (Ruiz-scaled, padded).

    ``Dscale`` is the primal unscaling diagonal (z_template = Dscale * x);
    in f64 the scaling is numerically optional, in f32 it is what keeps
    the per-iteration LU factorizations near unit scale (unscaled, the
    cartpole's ~2e5 objective scale explodes the f32 duals — measured)."""
    P: jax.Array        # (n_p, n_p)
    q0: jax.Array       # (n_p,)
    Mq: jax.Array       # (n_p, ntheta)
    Ae: jax.Array       # (me_p, n_p)
    b0: jax.Array       # (me_p,)
    Mb: jax.Array       # (me_p, ntheta)
    Ai: jax.Array       # (mi_p, n_p)
    lo0: jax.Array      # (mi_p,)
    Mlo: jax.Array      # (mi_p, ntheta)
    up0: jax.Array      # (mi_p,)
    Mup: jax.Array      # (mi_p, ntheta)
    has_lo: jax.Array   # (mi_p,) 0/1 — finite lower bound
    has_up: jax.Array   # (mi_p,) 0/1 — finite upper bound
    Dscale: jax.Array   # (n_p,) primal unscaling diagonal


class IPSolution(NamedTuple):
    z_primal: jax.Array   # (n_p,)
    r_prim: jax.Array     # scalar residual
    r_dual: jax.Array
    gap: jax.Array        # complementarity measure mu


def _rup(v, k):
    return ((v + k - 1) // k) * k


def prepare_ip(template: QPTemplate, pad_to: int = 8,
               dtype=jnp.float32, equilibrate: bool = True) -> IPSpec:
    """Split template rows into equality/inequality blocks, Ruiz-scale,
    pad, cast."""
    from .qp import _ruiz_equilibrate
    if equilibrate:
        qc = (np.column_stack([template.q0.reshape(-1, 1), template.Mq])
              if template.Mq.size else template.q0.reshape(-1, 1))
        Ps, As, Dv, Ev, c = _ruiz_equilibrate(template.P, template.A, qc)
    else:
        Ps, As = template.P, template.A
        Dv = np.ones(template.n)
        Ev = np.ones(template.m)
        c = 1.0
    q0_s = c * Dv * template.q0
    Mq_s = c * Dv[:, None] * template.Mq
    fin_l = np.isfinite(template.l0)
    fin_u = np.isfinite(template.u0)
    l0_s = np.where(fin_l, Ev * template.l0, -np.inf)
    u0_s = np.where(fin_u, Ev * template.u0, np.inf)
    Ml_s = Ev[:, None] * template.Ml
    Mu_s = Ev[:, None] * template.Mu

    eq = template.is_eq
    ineq = ~eq
    Ae, Ai = As[eq], As[ineq]
    b0, Mb = u0_s[eq], Mu_s[eq]
    lo0, Mlo = l0_s[ineq], Ml_s[ineq]
    up0, Mup = u0_s[ineq], Mu_s[ineq]
    has_lo = np.isfinite(lo0).astype(np.float64)
    has_up = np.isfinite(up0).astype(np.float64)
    lo0 = np.where(np.isfinite(lo0), lo0, 0.0)
    up0 = np.where(np.isfinite(up0), up0, 0.0)

    n = template.n
    me, mi = Ae.shape[0], Ai.shape[0]
    nt = template.ntheta
    n_p, me_p, mi_p = _rup(n, pad_to), _rup(max(me, 1), pad_to), \
        _rup(max(mi, 1), pad_to)
    # each padded equality row gets its own unit column on a padded
    # variable (keeps the KKT full-rank); make sure enough exist
    if n_p - n < me_p - me:
        n_p = _rup(n + (me_p - me), pad_to)

    def padm(M, r, c):
        out = np.zeros((r, c))
        out[:M.shape[0], :M.shape[1]] = M
        return out

    def padv(v, r, fill=0.0):
        out = np.full(r, fill)
        out[:v.shape[0]] = v
        return out

    P_p = padm(Ps, n_p, n_p)
    np.fill_diagonal(P_p[n:, n:], 1.0)   # benign padding block
    # padded equality rows: 0 = 0 (Ae rows zero, b zero) — but the KKT
    # factorization needs full row rank; give padded rows a unit column on
    # padded variables instead.
    Ae_p = padm(Ae, me_p, n_p)
    for i in range(me, me_p):
        Ae_p[i, n + (i - me)] = 1.0
    Ai_p = padm(Ai, mi_p, n_p)

    return IPSpec(
        P=jnp.asarray(P_p, dtype),
        q0=jnp.asarray(padv(q0_s, n_p), dtype),
        Mq=jnp.asarray(padm(Mq_s, n_p, nt), dtype),
        Ae=jnp.asarray(Ae_p, dtype),
        b0=jnp.asarray(padv(b0, me_p), dtype),
        Mb=jnp.asarray(padm(Mb, me_p, nt), dtype),
        Ai=jnp.asarray(Ai_p, dtype),
        lo0=jnp.asarray(padv(lo0, mi_p, fill=-1.0), dtype),
        Mlo=jnp.asarray(padm(Mlo, mi_p, nt), dtype),
        up0=jnp.asarray(padv(up0, mi_p, fill=1.0), dtype),
        Mup=jnp.asarray(padm(Mup, mi_p, nt), dtype),
        has_lo=jnp.asarray(padv(has_lo, mi_p, fill=1.0), dtype),
        has_up=jnp.asarray(padv(has_up, mi_p, fill=1.0), dtype),
        Dscale=jnp.asarray(padv(Dv, n_p, fill=1.0), dtype),
    )


def ip_solve(spec: IPSpec, theta: jax.Array, iters: int = 25) -> IPSolution:
    """Mehrotra predictor-corrector; vmap over ``theta`` for batches.

    Mirrors the float64 host oracle (``utils/qp_ref.py``) with static
    shapes: infinite bounds enter with zero barrier weight via the
    ``has_lo``/``has_up`` masks.
    """
    dt = spec.P.dtype
    theta = theta.astype(dt)
    q = spec.q0 + mm(spec.Mq, theta)
    b = spec.b0 + mm(spec.Mb, theta)
    lo = spec.lo0 + mm(spec.Mlo, theta)
    up = spec.up0 + mm(spec.Mup, theta)

    n = spec.P.shape[0]
    me = spec.Ae.shape[0]
    mi = spec.Ai.shape[0]
    hl, hu = spec.has_lo, spec.has_up
    n_active = jnp.maximum(jnp.sum(hl) + jnp.sum(hu), 1.0)
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)

    # start: x from the equality-regularized system, unit slacks/duals
    K0 = jnp.zeros((n + me, n + me), dt)
    K0 = K0.at[:n, :n].set(spec.P + jnp.eye(n, dtype=dt))
    K0 = K0.at[:n, n:].set(spec.Ae.T)
    K0 = K0.at[n:, :n].set(spec.Ae)
    K0 = K0.at[n:, n:].set(-1e-8 * jnp.eye(me, dtype=dt))
    lu0 = jax.scipy.linalg.lu_factor(K0)
    xy = jax.scipy.linalg.lu_solve(lu0, jnp.concatenate([-q, b]))
    x = xy[:n]
    su = jnp.maximum(hu * (up - mm(spec.Ai, x)), 1.0)
    sl = jnp.maximum(hl * (mm(spec.Ai, x) - lo), 1.0)
    lu_ = jnp.ones(mi, dt) * hu
    ll_ = jnp.ones(mi, dt) * hl
    su = jnp.where(hu > 0, su, 1.0)
    sl = jnp.where(hl > 0, sl, 1.0)
    lu_ = jnp.where(hu > 0, lu_, 0.0) + (1 - hu)  # keep products benign
    ll_ = jnp.where(hl > 0, ll_, 0.0) + (1 - hl)
    y = jnp.zeros(me, dt)

    def max_step(v, dv, mask):
        # largest a in (0,1] with v + a dv >= 0 on masked rows
        neg = jnp.logical_and(dv < 0, mask > 0)
        ratios = jnp.where(neg, -v / jnp.where(neg, dv, -1.0), 1.0)
        return jnp.minimum(1.0, jnp.min(ratios))

    # freeze threshold: f64 can drive mu to ~1e-13 before the lam/s ratios
    # poison the factorization; f32's usable barrier floor is ~1e-6 —
    # pushing past it explodes the duals (measured: rd ~ 2e6 on the
    # condensed cartpole with the old 1e-12 threshold) without improving
    # the primal
    stop_mu = jnp.asarray(100.0, dt) * eps * eps if dt == jnp.float64 \
        else jnp.asarray(1e-6, dt)

    def body(_, st):
        x, y, su, sl, lu_, ll_ = st
        Aix = mm(spec.Ai, x)
        rd = (mm(spec.P, x) + q + mm(spec.Ae.T, y)
              + mm(spec.Ai.T, hu * lu_ - hl * ll_))
        re = mm(spec.Ae, x) - b
        riu = hu * (Aix + su - up)
        ril = hl * (Aix - sl - lo)
        mu = (jnp.sum(hu * su * lu_) + jnp.sum(hl * sl * ll_)) / n_active

        Du = hu * lu_ / su
        Dl = hl * ll_ / sl
        D = Du + Dl
        H = spec.P + mm(spec.Ai.T * D, spec.Ai)
        K = jnp.zeros((n + me, n + me), dt)
        K = K.at[:n, :n].set(H + 1e-10 * jnp.eye(n, dtype=dt))
        K = K.at[:n, n:].set(spec.Ae.T)
        K = K.at[n:, :n].set(spec.Ae)
        K = K.at[n:, n:].set(-1e-10 * jnp.eye(me, dtype=dt))
        lufac = jax.scipy.linalg.lu_factor(K)

        def directions(rcu, rcl):
            # eliminate (ds, dlam) for both bound sides:
            #   dsu = -riu - Ai dx,   dsl = ril + Ai dx
            #   dlam_u = (-rcu - lam_u dsu)/su,  dlam_l = (-rcl - lam_l dsl)/sl
            # => dlam_u - dlam_l = (tmp_u - tmp_l) + D (Ai dx)
            tmp_u = hu * (-rcu + lu_ * riu) / su
            tmp_l = hl * (-rcl - ll_ * ril) / sl
            rhs_x = -rd - mm(spec.Ai.T, tmp_u - tmp_l)
            sol = jax.scipy.linalg.lu_solve(
                lufac, jnp.concatenate([rhs_x, -re]))
            dx, dy = sol[:n], sol[n:]
            dAix = mm(spec.Ai, dx)
            dsu = hu * (-riu - dAix)
            dsl = hl * (ril + dAix)
            dlu = hu * (-rcu - lu_ * dsu) / su
            dll = hl * (-rcl - ll_ * dsl) / sl
            return dx, dy, dsu, dsl, dlu, dll

        # predictor
        dx_a, dy_a, dsu_a, dsl_a, dlu_a, dll_a = directions(
            hu * lu_ * su, hl * ll_ * sl)
        ap = jnp.minimum(max_step(su, dsu_a, hu), max_step(sl, dsl_a, hl))
        ad = jnp.minimum(max_step(lu_, dlu_a, hu), max_step(ll_, dll_a, hl))
        mu_aff = (jnp.sum(hu * (su + ap * dsu_a) * (lu_ + ad * dlu_a))
                  + jnp.sum(hl * (sl + ap * dsl_a) * (ll_ + ad * dll_a))
                  ) / n_active
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, eps)) ** 3, 0.0, 1.0)

        # corrector
        rcu = hu * (lu_ * su + dlu_a * dsu_a - sigma * mu)
        rcl = hl * (ll_ * sl + dll_a * dsl_a - sigma * mu)
        dx, dy, dsu, dsl, dlu, dll = directions(rcu, rcl)
        ap = jnp.minimum(1.0, 0.99 * jnp.minimum(max_step(su, dsu, hu),
                                                 max_step(sl, dsl, hl)))
        ad = jnp.minimum(1.0, 0.99 * jnp.minimum(max_step(lu_, dlu, hu),
                                                 max_step(ll_, dll, hl)))
        x_n = x + ap * dx
        y_n = y + ad * dy
        su_n = jnp.where(hu > 0, su + ap * dsu, su)
        sl_n = jnp.where(hl > 0, sl + ap * dsl, sl)
        lu_n = jnp.where(hu > 0, lu_ + ad * dlu, lu_)
        ll_n = jnp.where(hl > 0, ll_ + ad * dll, ll_)
        # freeze once converged: prevents post-convergence dual overflow
        # (lam/s ratios diverge as mu -> 0) under the fixed iteration count
        go = jnp.logical_and(mu > stop_mu, jnp.isfinite(mu))
        pick = lambda a_new, a_old: jnp.where(go, a_new, a_old)
        return (pick(x_n, x), pick(y_n, y), pick(su_n, su),
                pick(sl_n, sl), pick(lu_n, lu_), pick(ll_n, ll_))

    x, y, su, sl, lu_, ll_ = jax.lax.fori_loop(
        0, iters, body, (x, y, su, sl, lu_, ll_))

    Aix = mm(spec.Ai, x)
    r_prim = jnp.maximum(
        jnp.max(jnp.abs(mm(spec.Ae, x) - b)),
        jnp.maximum(jnp.max(hu * jnp.maximum(Aix - up, 0.0)),
                    jnp.max(hl * jnp.maximum(lo - Aix, 0.0))))
    r_dual = jnp.max(jnp.abs(
        mm(spec.P, x) + q + mm(spec.Ae.T, y)
        + mm(spec.Ai.T, hu * lu_ - hl * ll_)))
    gap = (jnp.sum(hu * su * lu_) + jnp.sum(hl * sl * ll_)) / n_active
    return IPSolution(z_primal=spec.Dscale * x, r_prim=r_prim,
                      r_dual=r_dual, gap=gap)
