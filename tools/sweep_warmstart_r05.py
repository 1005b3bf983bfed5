"""Round-5 ADMM budget/precision sweep (VERDICT asks #2 and #4).

For a grid of (iters, iters2, phase2_precision) configs, measures on the
flagship scenario (double integrator, T=120, 70% loss — the bench
configuration):

* per-element trajectory parity vs the f64 protocol oracle,
* BATCHED (vmapped) trajectory parity vs the same oracle,
* batched throughput (rollouts/s) at BENCH-style batch,

and writes ``WARMSTART_SWEEP_r05.json``.  The round-4 shipped default is
60+60 (1.7e-4 / 3.7e-3 parity); the ask is <=40+40 at >= that parity, or
a recorded negative.

    python tools/sweep_warmstart_r05.py              # TPU
    python tools/sweep_warmstart_r05.py --platform cpu --batch 256
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from rtmpc_tpu.utils import box
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.parallel import make_batched_rollout
    from rtmpc_tpu.parallel.rollout import make_rollout_fn
    from rtmpc_tpu.protocol import draw_loss_masks, draw_disturbances
    from oracle_protocol import run_oracle_rollout

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)

    T = 120
    rng = np.random.default_rng(7)
    theta = (rng.uniform(size=T) >= 0.7).astype(np.int64)
    gamma = (rng.uniform(size=T) >= 0.7).astype(np.int64)
    theta[0] = gamma[0] = 1
    w = rng.uniform(-0.1, 0.1, size=(T, 2))
    refs = np.zeros((T, 2))
    refs[:T // 4, 0] = 5.0
    refs[T // 4:T // 2, 0] = -9.0
    refs[T // 2:, 0] = 4.0
    x0 = np.zeros(2)
    oracle = run_oracle_rollout(setup, x0, refs, w, theta, gamma)
    assert oracle["feasible"]

    # throughput inputs (bench-style: random refs/losses per element)
    Bb = args.batch
    key = jax.random.PRNGKey(0)
    th_b, gm_b = draw_loss_masks(key, T, 0.7, 0.7, batch_shape=(Bb,))
    w_b = draw_disturbances(jax.random.fold_in(key, 1), T,
                            -np.array([0.1, 0.1]), np.array([0.1, 0.1]),
                            batch_shape=(Bb,))
    refs_b = jnp.broadcast_to(jnp.asarray(refs, jnp.float32), (Bb, T, 2))
    x0_b = jnp.zeros((Bb, 2), jnp.float32)

    # (base_matmul_precision, iters, iters2, phase2_override):
    # the bench/engine default is base "high" (3-pass bf16, ~1.5x faster
    # end-to-end); phase2_precision="highest" upgrades only the phase-2
    # matmuls.  Base "highest" rows measure the engine-wide upgrade.
    grid = [dict(base="high", iters=60, iters2=60, phase2_precision=None),
            dict(base="high", iters=60, iters2=60,
                 phase2_precision="highest"),
            dict(base="highest", iters=60, iters2=60,
                 phase2_precision=None),
            dict(base="high", iters=40, iters2=40, phase2_precision=None),
            dict(base="highest", iters=40, iters2=40,
                 phase2_precision=None),
            dict(base="high", iters=50, iters2=50, phase2_precision=None),
            dict(base="highest", iters=50, iters2=50,
                 phase2_precision=None)]

    from rtmpc_tpu.ops.precision import set_matmul_precision
    rows = []
    for g in grid:
        g = dict(g)
        base = g.pop("base")
        set_matmul_precision(base)
        jax.clear_caches()
        arrays, cfg = setup.to_device(
            dtype=jnp.float32, alpha=1.8, rho2_scale=0.2, **g)
        # per-element parity
        fn = jax.jit(make_rollout_fn(arrays, cfg, T))
        _, outs = fn(jnp.asarray(x0, jnp.float32),
                     jnp.asarray(refs, jnp.float32),
                     jnp.asarray(w, jnp.float32),
                     jnp.asarray(theta, jnp.int32),
                     jnp.asarray(gamma, jnp.int32))
        terr = float(np.max(np.abs(np.asarray(outs.x) - oracle["x"])))
        # batched parity (same element broadcast 64-wide)
        roll64 = jax.jit(make_batched_rollout(arrays, cfg, T))
        rep = lambda a, dt: jnp.broadcast_to(
            jnp.asarray(a, dt), (64,) + np.asarray(a).shape)
        _, outs_b = roll64(rep(x0, jnp.float32), rep(refs, jnp.float32),
                           rep(w, jnp.float32), rep(theta, jnp.int32),
                           rep(gamma, jnp.int32))
        berr = float(np.max(np.abs(np.asarray(outs_b.x) - oracle["x"][None])))
        # throughput
        roll = jax.jit(make_batched_rollout(arrays, cfg, T))
        out = roll(x0_b, refs_b, w_b, th_b, gm_b)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = roll(x0_b, refs_b, w_b, th_b, gm_b)
        jax.block_until_ready(out)
        dt_s = (time.time() - t0) / args.reps
        rps = Bb / dt_s
        row = {"base_precision": base, **g, "traj_max_abs_err": terr,
               "batched_traj_max_abs_err": berr,
               "rollouts_per_s": round(rps, 1)}
        rows.append(row)
        print(json.dumps(row))

    out_path = os.path.join(_ROOT, "WARMSTART_SWEEP_r05.json")
    with open(out_path, "w") as f:
        json.dump({"batch": Bb, "T": T, "rows": rows}, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    raise SystemExit(main())
