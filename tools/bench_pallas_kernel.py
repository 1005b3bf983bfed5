"""Standalone solver shootout on the real device: vmapped-XLA ADMM vs the
fused Pallas kernel, compiled (NOT interpret mode), plus a compiled parity
check between the two.

To factor out the per-dispatch tunnel-RPC overhead (~1 ms on this rig),
each measurement chains STEPS warm-started solves inside one ``lax.scan``
— exactly how the rollout engine invokes the solver.

Usage: python tools/bench_pallas_kernel.py [B] [ITERS] [STEPS]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from rtmpc_tpu.utils import box
from rtmpc_tpu.models import setup_tube_tracking
from rtmpc_tpu.ops.qp import admm_solve, init_admm_state, ADMMState
from rtmpc_tpu.ops.qp_pallas import admm_solve_pallas
from rtmpc_tpu.ops import precision


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    REPS = 10

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    Bm = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, Bm, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, _ = setup.to_device(iters=ITERS)
    spec = arrays.admm
    n_p, m_p = spec.Kinv.shape[0], spec.As.shape[0]
    print(f"device: {jax.devices()[0]}  n_p: {n_p}  m_p: {m_p}  "
          f"B: {B}  iters: {ITERS}  chained steps: {STEPS}")

    rng = np.random.default_rng(0)
    thetas = jnp.asarray(rng.uniform(-2, 2, (STEPS, B, 4)), jnp.float32)

    def scan_xla(thetas):
        def step(st, th):
            sol = jax.vmap(lambda t, s: admm_solve(spec, t, s, iters=ITERS)
                           )(th, st)
            return sol.state, (sol.z_primal, sol.r_prim)
        st0 = jax.vmap(lambda _: init_admm_state(spec))(jnp.arange(B))
        return jax.lax.scan(step, st0, thetas)

    def make_scan_pallas(bb):
        def scan_pallas(thetas):
            def step(st, th):
                sol = admm_solve_pallas(spec, th, st, iters=ITERS,
                                        block_b=bb)
                return sol.state, (sol.z_primal, sol.r_prim)
            st0 = ADMMState(x=jnp.zeros((B, n_p), jnp.float32),
                            y=jnp.zeros((B, m_p), jnp.float32),
                            z=jnp.zeros((B, m_p), jnp.float32))
            return jax.lax.scan(step, st0, thetas)
        return scan_pallas

    def timeit(name, fn, *args):
        out = fn(*args)            # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS / STEPS
        print(f"{name:32s} {dt*1e3:8.3f} ms/step  "
              f"{B/dt/1e6:8.3f} Msolves/s")
        return out, dt

    for prec in ("highest", "high"):
        precision.set_matmul_precision(prec)
        jax.clear_caches()

        (st_ref, (z_ref, rp_ref)), dt_x = timeit(
            f"xla vmap admm  [{prec}]", jax.jit(scan_xla), thetas)

        for bb in (512, 1024, 2048):
            try:
                (st_p, (z_p, rp_p)), dt_p = timeit(
                    f"pallas bb={bb:<5d} [{prec}]",
                    jax.jit(make_scan_pallas(bb)), thetas)
            except Exception as e:
                print(f"pallas bb={bb} [{prec}] FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}")
                continue
            err = float(jnp.max(jnp.abs(z_p - z_ref)))
            print(f"   max |z_pallas - z_xla| (all steps) = {err:.3e}   "
                  f"speedup vs xla: {dt_x/dt_p:.2f}x")


if __name__ == "__main__":
    main()
