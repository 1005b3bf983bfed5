"""Benchmark: batched lossy-network closed-loop tube-MPC rollouts.

Measures the BASELINE.json primary metrics on the flagship configuration
(``Example_of_Tube_Tracking_MPC_Over_Lossy_Network``: double integrator,
N=10 horizon, X=+-8, U=+-1, W=+-0.1, 70% packet loss both directions,
T=120 steps, one tracking QP per step per rollout):

* ``rollouts_per_s``   — closed-loop lossy-network rollouts per second
* ``qp_solves_per_s``  — tracking-QP solves per second (= rollouts/s * T)
* ``p99_step_ms``      — p99 latency of one controller step (single-instance
                         QP solve + packet assembly), vs the reference's
                         20 ms real-time budget (50 Hz control)

Prints ONE JSON line.  ``vs_baseline`` is rollouts/s against the 10k
rollouts/s BASELINE.json north-star target (defined for a v5p-16; this
prints whatever the visible devices deliver).

Env knobs: BENCH_BATCH (default 4096), BENCH_T (120), BENCH_ITERS (60),
BENCH_REPS (5), BENCH_DTYPE (float32).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # e.g. BENCH_PLATFORM=cpu for validation runs; env vars alone are
        # not enough on this image (sitecustomize pre-imports jax)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from rtmpc_tpu.utils import box
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.protocol import draw_loss_masks, draw_disturbances
    from rtmpc_tpu.parallel import make_batched_rollout
    from rtmpc_tpu.parallel.rollout import make_rollout_fn

    from rtmpc_tpu.ops.precision import (get_matmul_precision,
                                         set_matmul_precision)
    # 3-pass-bf16 accumulation: validated on the bench configs (feasibility
    # and residuals match HIGHEST, ~1.5x faster); BENCH_PRECISION=highest
    # for the conservative full-f32 path
    set_matmul_precision(os.environ.get("BENCH_PRECISION", "high"))

    BATCH = int(os.environ.get("BENCH_BATCH", 4096))
    T = int(os.environ.get("BENCH_T", 120))
    ITERS = int(os.environ.get("BENCH_ITERS", 60))
    REPS = int(os.environ.get("BENCH_REPS", 5))
    POLISH = bool(int(os.environ.get("BENCH_POLISH", "0")))
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "float32"))

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, cfg = setup.to_device(dtype=dtype, iters=ITERS, polish=POLISH)
    nx = cfg.nx

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    theta, gamma = draw_loss_masks(k1, T, 0.7, 0.7, batch_shape=(BATCH,))
    w = draw_disturbances(k2, T, -0.1 * np.ones(nx), 0.1 * np.ones(nx),
                          batch_shape=(BATCH,)).astype(dtype)
    refs_np = np.zeros((T, nx), dtype=np.float64)
    refs_np[: T // 4, 0] = 5.0
    refs_np[T // 4: T // 2, 0] = -9.0
    refs_np[T // 2:, 0] = 4.0
    refs = jnp.broadcast_to(jnp.asarray(refs_np, dtype), (BATCH, T, nx))
    x0 = jnp.zeros((BATCH, nx), dtype)

    rollout = jax.jit(make_batched_rollout(arrays, cfg, T))

    # shard the rollout batch over every visible device (pure data
    # parallelism over scenarios — SURVEY.md section 2.4); jit partitions
    # the vmapped computation automatically from the input shardings
    n_dev = len(jax.devices())
    if n_dev > 1 and BATCH % n_dev == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
        sh = NamedSharding(mesh, P("dp"))
        x0, refs, w, theta, gamma = (
            jax.device_put(a, sh) for a in (x0, refs, w, theta, gamma))

    # warm-up / compile
    carry, outs = rollout(x0, refs, w, theta, gamma)
    outs.x.block_until_ready()
    feasible_frac = float(jnp.mean(carry.feasible.astype(jnp.float32)))

    if os.environ.get("BENCH_PROFILE"):
        with jax.profiler.trace(os.environ["BENCH_PROFILE"]):
            rollout(x0, refs, w, theta, gamma)[1].x.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(REPS):
        carry, outs = rollout(x0, refs, w, theta, gamma)
    outs.x.block_until_ready()
    dt_total = (time.perf_counter() - t0) / REPS

    rollouts_per_s = BATCH / dt_total
    qp_solves_per_s = rollouts_per_s * T

    # single-controller-step latency (one QP instance, the real-time path).
    # A deployed controller runs steps back-to-back on a warm device, so the
    # per-step number is a sequential T-step rollout divided by T; the
    # dispatch-inclusive number (one host->device call per step, dominated
    # on this rig by the remote-TPU tunnel RPC) is reported separately.
    single_T = jax.jit(make_rollout_fn(arrays, cfg, T))
    argsT = (x0[0], refs[0], w[0], theta[0], gamma[0])
    single_T(*argsT)[1].x.block_until_ready()
    seq = []
    for _ in range(20):
        t1 = time.perf_counter()
        single_T(*argsT)[1].x.block_until_ready()
        seq.append((time.perf_counter() - t1) / T)
    p99_step_ms = float(np.quantile(np.array(seq), 0.99) * 1e3)

    single = jax.jit(make_rollout_fn(arrays, cfg, 1))
    args1 = (x0[0], refs[0, :1], w[0, :1], theta[0, :1], gamma[0, :1])
    single(*args1)[1].x.block_until_ready()
    lats = []
    for _ in range(100):
        t1 = time.perf_counter()
        single(*args1)[1].x.block_until_ready()
        lats.append(time.perf_counter() - t1)
    p99_dispatch_ms = float(np.quantile(np.array(lats), 0.99) * 1e3)

    result = {
        "metric": f"closed-loop lossy-network tube-MPC rollouts/s (N=10, T={T})",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / 10000.0, 4),
        "qp_solves_per_s": round(qp_solves_per_s, 0),
        "p99_step_ms": round(p99_step_ms, 3),
        "p99_dispatch_ms": round(p99_dispatch_ms, 3),
        "realtime_budget_ms": 20.0,
        "batch": BATCH,
        "T": T,
        "admm_iters": ITERS,
        "polish": POLISH,
        "dtype": str(dtype),
        "matmul_precision": get_matmul_precision(),
        "feasible_frac": feasible_frac,
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
