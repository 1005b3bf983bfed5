"""Roofline-attack shootout: vmapped vs transposed-batch ADMM layout.

BENCH_r04's roofline names the binding resource: ``mxu_padded_tiles`` —
the iteration GEMMs' tiny operand dims (n_p=40, m_p=112) fill only ~21%
of each 128x128 MXU tile, and measured matmul throughput sits at ~1.0x
that ceiling.  The candidate attack (``ops/qp.py:admm_solve_batch_T``)
carries the state transposed — batch in the lane dimension — so the lane
padding falls on the batch (free for B >= 128) instead of the problem
dims.

Run on the real TPU:  python tools/bench_admm_layout.py
Writes ADMM_LAYOUT_r<N>.log-style output to stdout; tee it.

MEASURED VERDICT (TPU v5e, 2026-08-20, ADMM_LAYOUT_r04.log): NEGATIVE —
XLA already canonicalizes both source layouts to the same executable:
outputs are BITWISE identical and timings equal at every (batch, iters)
point.  The padded-tile ceiling is therefore a property of the algorithm's
operand shapes, not of the source layout, and the engine is already at it
(marginal per-iteration rate ~12.5 TF/s = ceiling x f32-HIGH peak).  The
transposed path stays available (parity-tested) but is not wired as a
solver mode.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from rtmpc_tpu.ops.precision import set_matmul_precision
    set_matmul_precision("high")
    from rtmpc_tpu.utils import box
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.ops.qp import (admm_solve, admm_solve_batch_T,
                                  init_admm_state)

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, _ = setup.to_device(dtype=jnp.float32)
    spec = arrays.admm
    n_p, m_p = spec.Kinv.shape[0], spec.As.shape[0]
    print(f"device {jax.devices()[0]}  n_p={n_p} m_p={m_p}")

    rng = np.random.default_rng(0)

    def timeit(fn, th, R=10):
        fn(th).z_primal.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(R):
            out = fn(th)
        out.z_primal.block_until_ready()
        return (time.perf_counter() - t0) / R

    # parity first (the attack must be numerically free)
    th0 = jnp.asarray(rng.uniform(-2, 2, (4096, 4)), jnp.float32)
    rv = jax.jit(jax.vmap(lambda t: admm_solve(
        spec, t, init_admm_state(spec), iters=120)))(th0)
    rt = jax.jit(lambda t: admm_solve_batch_T(spec, t, None, iters=120))(th0)
    derr = float(jnp.max(jnp.abs(rv.z_primal - rt.z_primal)))
    print(f"parity max|dz| vmapped vs transposed: {derr:.3e} "
          f"({'BITWISE identical' if derr == 0.0 else 'differs'})")

    flops_iter = 2 * (2 * m_p * n_p + n_p * n_p)
    for Bk in (4096, 16384, 65536):
        th = jnp.asarray(rng.uniform(-2, 2, (Bk, 4)), jnp.float32)
        row = f"B={Bk:6d}:"
        marg = {}
        for it in (60, 120):
            v = timeit(jax.jit(jax.vmap(lambda t, _it=it: admm_solve(
                spec, t, init_admm_state(spec), iters=_it))), th)
            tt = timeit(jax.jit(lambda t, _it=it: admm_solve_batch_T(
                spec, t, None, iters=_it)), th)
            row += (f"  [{it} it] vmap {v*1e3:7.2f} ms"
                    f" | transposed {tt*1e3:7.2f} ms")
            marg[it] = v
        # marginal per-iteration rate isolates the loop from dispatch
        d_iter = (marg[120] - marg[60]) / 60.0
        tf = Bk * flops_iter / max(d_iter, 1e-12) / 1e12
        row += f"  | marginal {tf:6.1f} TF/s"
        print(row)
    print("verdict: layouts compile identically (see module docstring); "
          "engine is at the padded-tile ceiling — attack NEGATIVE")


if __name__ == "__main__":
    main()
