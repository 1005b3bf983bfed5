"""Diagnose the early-exit iteration distribution of the closed-loop ADMM.

Replays the exact warm-started solve sequence of a batched rollout (the
rollout records x_hat per step; theta_t = [x_hat_t; ref_t] and the warm
state chains through the steps), counting for every (step, lane) the first
multiple of ``check_every`` iterations at which BOTH scaled residuals drop
below tol.  Because a vmapped ``while_loop`` advances the whole batch at
the pace of its slowest lane, the number that matters for throughput is
the per-step LANE MAX — this prints its distribution so the early-exit
tolerance/budget can be chosen on data.

    python tools/probe_early_exit.py --batch 256 --tol 1e-3 3e-4
"""

import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--T", type=int, default=120)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--check-every", type=int, default=25)
    ap.add_argument("--tol", type=float, nargs="+", default=[1e-3, 3e-4])
    ap.add_argument("--dual-factor", type=float, default=25.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from rtmpc_tpu.ops.precision import mm, set_matmul_precision
    set_matmul_precision("high")
    from rtmpc_tpu.utils import box
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.protocol import draw_loss_masks, draw_disturbances
    from rtmpc_tpu.parallel import make_batched_rollout
    from rtmpc_tpu.ops.qp import _admm_body, init_admm_state

    B, T = args.batch, args.T
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    Bm = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, Bm, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, cfg = setup.to_device(dtype=jnp.float32, iters=args.iters)
    spec = arrays.admm

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    theta, gamma = draw_loss_masks(k1, T, 0.7, 0.7, batch_shape=(B,))
    w = draw_disturbances(k2, T, -0.1 * np.ones(2), 0.1 * np.ones(2),
                          batch_shape=(B,)).astype(jnp.float32)
    refs_np = np.zeros((T, 2), np.float64)
    refs_np[: T // 4, 0] = 5.0
    refs_np[T // 4: T // 2, 0] = -9.0
    refs_np[T // 2:, 0] = 4.0
    refs = jnp.broadcast_to(jnp.asarray(refs_np, jnp.float32), (B, T, 2))
    x0 = jnp.zeros((B, 2), jnp.float32)

    rollout = jax.jit(make_batched_rollout(arrays, cfg, T))
    _, outs = rollout(x0, refs, w, theta, gamma)
    x_hat = np.asarray(outs.x_hat)              # (B, T, nx)

    thetas = jnp.concatenate(
        [jnp.asarray(x_hat, jnp.float32), refs], axis=-1)  # (B, T, 4)

    n_chunks = (args.iters + args.check_every - 1) // args.check_every
    tols = jnp.asarray(args.tol, jnp.float32)

    def replay_one(theta_seq):
        """Per-lane replay: scan steps; inside, run chunks and record the
        first chunk index at which each tol is satisfied."""
        def step(state, th):
            q = spec.q0 + mm(spec.Mq, th)
            l = spec.l0 + mm(spec.Ml, th)
            u = spec.u0 + mm(spec.Mu, th)
            body = _admm_body(spec, q, l, u)

            def chunk(c, _):
                s, done_at, ci = c
                s = jax.lax.fori_loop(0, args.check_every,
                                      lambda _, t: body(t), s)
                rp = jnp.max(jnp.abs(mm(spec.As, s.x) - s.z))
                rd = jnp.max(jnp.abs(mm(spec.Ps, s.x) + q
                                     + mm(spec.As.T, s.y)))
                ok = jnp.logical_and(rp < tols,
                                     rd < tols * args.dual_factor)
                done_at = jnp.where(
                    jnp.logical_and(ok, done_at < 0), ci + 1, done_at)
                return (s, done_at, ci + 1), None

            init = (state, -jnp.ones(tols.shape[0], jnp.int32),
                    jnp.zeros((), jnp.int32))
            (s, done_at, _), _ = jax.lax.scan(chunk, init, None,
                                              length=n_chunks)
            # -1 => never converged within budget: charge the full budget
            done_at = jnp.where(done_at < 0, n_chunks, done_at)
            return s, done_at * args.check_every

        _, iters_used = jax.lax.scan(step, init_admm_state(spec),
                                     theta_seq)
        return iters_used                        # (T, n_tols)

    iters_used = jax.jit(jax.vmap(replay_one))(thetas)   # (B, T, n_tols)
    iters_used = np.asarray(iters_used)

    for k, tol in enumerate(args.tol):
        iu = iters_used[:, :, k]                # (B, T)
        lane_max = iu.max(axis=0)               # (T,) what gates the batch
        print(f"\n== tol {tol:g} (budget {args.iters}, "
              f"chunk {args.check_every}) ==")
        print(f"per-(lane,step) iters: mean {iu.mean():.0f} "
              f"p50 {np.median(iu):.0f} p90 {np.quantile(iu, .9):.0f} "
              f"max {iu.max()}")
        print(f"per-step LANE MAX:     mean {lane_max.mean():.0f} "
              f"p50 {np.median(lane_max):.0f} "
              f"p90 {np.quantile(lane_max, .9):.0f} max {lane_max.max()}")
        print(f"steps at full budget (lane max): "
              f"{int((lane_max >= args.iters).sum())}/{T}")
        frac = iu.mean() / args.iters
        fracm = lane_max.mean() / args.iters
        print(f"compute fraction vs fixed budget: per-lane {frac:.2f}, "
              f"batch-gated {fracm:.2f}")


if __name__ == "__main__":
    main()
