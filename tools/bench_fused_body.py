"""Microbench: current 3-matmul ADMM body vs the fused-composite body.

The iteration  xt = Kinv(sigma x - q + As'(rho z - y)),  zt = As xt  is a
3-deep DEPENDENT matmul chain of small operands; with the precomputed
composites (ops/qp.py ADMMSpec.Gxc/Gsc/Kcat, built for the Pallas kernel)
the same update is

    [xt | zt] = x @ Gxc + s @ Gsc - qK,     s = rho z - y,
    qK = q @ Kcat   (per-instance, hoisted out of the loop)

— two INDEPENDENT wide matmuls.  ~2.5x the FLOPs, 1/3 the dependency
depth; on small-operand MXU work the chain latency usually dominates.

    python tools/bench_fused_body.py [B] [ITERS] [STEPS]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from rtmpc_tpu.utils import box
from rtmpc_tpu.models import setup_tube_tracking
from rtmpc_tpu.ops.qp import ADMMState, admm_solve, init_admm_state
from rtmpc_tpu.ops.precision import mm, set_matmul_precision


def fused_solve(spec, theta, state, iters):
    theta = theta.astype(spec.q0.dtype)
    q = spec.q0 + mm(spec.Mq, theta)
    l = spec.l0 + mm(spec.Ml, theta)
    u = spec.u0 + mm(spec.Mu, theta)
    qK = mm(q, spec.Kcat)                      # hoisted
    n_p = spec.Kinv.shape[0]
    m_p = spec.As.shape[0]
    nblk = spec.Gxc.shape[1] - ((m_p + 127) // 128) * 128
    sigma, alpha = spec.sigma, spec.alpha

    def body(_, s_):
        x, y, z = s_
        s = spec.rho * z - y
        xtzt = mm(x, spec.Gxc) + mm(s, spec.Gsc) - qK
        xt = xtzt[..., :n_p]
        zt = xtzt[..., nblk:nblk + m_p]
        x_new = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_mix + y * spec.rho_inv, l, u)
        y_new = y + spec.rho * (z_mix - z_new)
        return ADMMState(x_new, y_new, z_new)

    state = jax.lax.fori_loop(0, iters, body, state)
    return state


def depth2_solve(spec, theta, state, iters, KA):
    """Same FLOPs as the current body, dependency depth 2 instead of 3:
    xt = (sigma Kinv) x + KA s - Kq  with  KA = Kinv As' precomputed;
    the x- and s-matmuls are independent."""
    theta = theta.astype(spec.q0.dtype)
    q = spec.q0 + mm(spec.Mq, theta)
    l = spec.l0 + mm(spec.Ml, theta)
    u = spec.u0 + mm(spec.Mu, theta)
    Kq = mm(spec.Kinv, q)
    sigma, alpha = spec.sigma, spec.alpha

    def body(_, s_):
        x, y, z = s_
        s = spec.rho * z - y
        xt = sigma * mm(spec.Kinv, x) + mm(KA, s) - Kq
        zt = mm(spec.As, xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_mix + y * spec.rho_inv, l, u)
        y_new = y + spec.rho * (z_mix - z_new)
        return ADMMState(x_new, y_new, z_new)

    return jax.lax.fori_loop(0, iters, body, state)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    set_matmul_precision("high")

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    Bm = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, Bm, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, _ = setup.to_device(iters=ITERS)
    spec = arrays.admm
    print(f"device: {jax.devices()[0]}  n_p={spec.Kinv.shape[0]} "
          f"m_p={spec.As.shape[0]} Gxc={spec.Gxc.shape}  B={B} "
          f"iters={ITERS} steps={STEPS}")

    rng = np.random.default_rng(0)
    thetas = jnp.asarray(rng.uniform(-2, 2, (STEPS, B, 4)), jnp.float32)

    def scan_current(ths):
        def step(st, th):
            sol = jax.vmap(lambda t, s: admm_solve(spec, t, s, iters=ITERS)
                           )(th, st)
            return sol.state, sol.z_primal
        st0 = jax.vmap(lambda _: init_admm_state(spec))(jnp.arange(B))
        return jax.lax.scan(step, st0, ths)

    def scan_fused(ths):
        def step(st, th):
            st = jax.vmap(lambda t, s: fused_solve(spec, t, s, ITERS)
                          )(th, st)
            return st, spec.D * st.x
        st0 = jax.vmap(lambda _: init_admm_state(spec))(jnp.arange(B))
        return jax.lax.scan(step, st0, ths)

    KA = mm(spec.Kinv, spec.As.T)

    def scan_depth2(ths):
        def step(st, th):
            st = jax.vmap(lambda t, s: depth2_solve(spec, t, s, ITERS, KA)
                          )(th, st)
            return st, spec.D * st.x
        st0 = jax.vmap(lambda _: init_admm_state(spec))(jnp.arange(B))
        return jax.lax.scan(step, st0, ths)

    out = {}
    for name, fn in (("current", scan_current), ("fused", scan_fused),
                     ("depth2", scan_depth2)):
        f = jax.jit(fn)
        _, zs = f(thetas)
        zs.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            _, zs = f(thetas)
        zs.block_until_ready()
        dt = (time.perf_counter() - t0) / 5 / STEPS
        out[name] = (dt, np.asarray(zs))
        print(f"{name:8s} {dt*1e3:7.3f} ms/step   "
              f"{B/dt/1e6:6.3f} Msolves/s")
    derr = np.abs(out["current"][1] - out["fused"][1]).max()
    print(f"max |z_current - z_fused| = {derr:.2e}   "
          f"speedup: {out['current'][0]/out['fused'][0]:.2f}x")


if __name__ == "__main__":
    main()
