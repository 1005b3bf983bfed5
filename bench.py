"""Benchmark: batched lossy-network closed-loop tube-MPC rollouts.

Measures the BASELINE.json primary metrics on the flagship configuration
(``Example_of_Tube_Tracking_MPC_Over_Lossy_Network``: double integrator,
N=10 horizon, X=+-8, U=+-1, W=+-0.1, 70% packet loss both directions,
T=120 steps, one tracking QP per step per rollout):

* ``rollouts_per_s``        — closed-loop lossy-network rollouts per second
* ``qp_solves_per_s``       — tracking-QP solves per second (rollouts/s * T)
* ``p99_step_ms``           — p99 DISPATCH-INCLUSIVE single-step latency
                              (one host->device call per control tick, the
                              reference's own measurement methodology);
                              compared against the 20 ms real-time budget
* ``step_device_ms``         — per-step device time of a batch-1 chained
                              rollout (back-to-back steps on a warm device,
                              no batch amortization, no dispatch)
* ``batched_step_amortized_ms`` — whole batched T-step rollout / T (throughput
                              figure, NOT a deployable latency)

Prints ONE JSON line.  ``vs_baseline`` is rollouts/s against the 10k
rollouts/s BASELINE.json north-star target (defined for a v5p-16; this
prints whatever the visible devices deliver).

The default configuration (ITERS, polish) is the one validated against the
float64 protocol oracle by ``tools/tpu_checks.py`` (PARITY_TPU_r*.json) —
throughput numbers are only quoted for trajectory-accurate settings.

Env knobs: BENCH_BATCH (default 4096), BENCH_T (120), BENCH_ITERS,
BENCH_POLISH, BENCH_REPS (5), BENCH_DTYPE (float32),
BENCH_SOLVER (admm|pallas|ip), BENCH_PRECISION (high|highest),
BENCH_PROFILE (trace dir).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Defaults validated by the on-device parity gate (tools/tpu_checks.py):
# 300 warm-started iterations give 6.4e-4 trajectory parity vs the f64
# oracle on the flagship scenario (measured on TPU v5e; 400 gives 1.1e-4).
# Polish is NOT used on TPU: measured there, the f32 LU-based polish never
# improves the iterate (its KKT residual loses to the ADMM's) and the
# per-step batched LU is ~1000x slower — iterations are the TPU accuracy
# lever.  BENCH_ITERS=60 is the documented throughput mode (~72k
# rollouts/s, trajectory envelope 2e-1 on the saturated-reference
# scenario, all tube invariants still hold).
# Two-phase rho schedule (round 3): phase 1 at the tuned rho drives the
# primal/active set, phase 2 at rho*0.2 converges the dual.  Measured on
# TPU v5e (tools/sweep_schedule.py + tpu_checks batched section):
# 1.7e-4 trajectory parity vs the f64 oracle (4x BETTER than the old
# fixed-300 default's 6.4e-4) at ~2.2x the round-2 throughput.
# phase1_precision single-pass bf16 is REJECTED for the default: it looks
# fine unbatched (matvecs run exact-f32 on the VPU) but diverges to 1e28
# under vmap (batched matvec = bf16 matmul on the rho_eq~1e3-stiff K);
# the batched-parity section of tools/tpu_checks.py now guards this.
DEFAULT_ITERS = 60
DEFAULT_ITERS2 = 60
DEFAULT_RHO2_SCALE = 0.2
DEFAULT_ALPHA = 1.8
DEFAULT_PHASE1_PRECISION = None
DEFAULT_POLISH = 0
DEFAULT_EARLY_TOL = None   # measured: no win (vmapped while_loop runs at
                           # the slowest lane's pace); see tools/sweep_early_exit.py


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
    from rtmpc_tpu.parallel.latency import (device_step_time,
                                            measure_step_latencies)

    from rtmpc_tpu.ops.precision import (get_matmul_precision,
                                         set_matmul_precision)
    # 3-pass-bf16 accumulation: validated on the bench configs (trajectory
    # parity vs the f64 oracle, tools/tpu_checks.py); BENCH_PRECISION=highest
    # for the conservative full-f32 path
    set_matmul_precision(os.environ.get("BENCH_PRECISION", "high"))

    # batch sweep on v5e (round 3): 4096 -> 43.0k, 8192 -> 43.9k,
    # 16384 -> 48.4k, 32768 -> 47.9k rollouts/s; 16384 saturates the chip
    BATCH = int(os.environ.get("BENCH_BATCH", 16384))
    T = int(os.environ.get("BENCH_T", 120))
    ITERS = int(os.environ.get("BENCH_ITERS", DEFAULT_ITERS))
    ITERS2 = int(os.environ.get("BENCH_ITERS2", DEFAULT_ITERS2))
    ALPHA = float(os.environ.get("BENCH_ALPHA", DEFAULT_ALPHA))
    RHO2_SCALE = float(os.environ.get("BENCH_RHO2_SCALE",
                                      DEFAULT_RHO2_SCALE))
    P1PREC = os.environ.get("BENCH_PHASE1_PRECISION",
                            DEFAULT_PHASE1_PRECISION or "none")
    P1PREC = None if P1PREC in ("none", "None", "") else P1PREC
    REPS = int(os.environ.get("BENCH_REPS", 5))
    POLISH = bool(int(os.environ.get("BENCH_POLISH", str(DEFAULT_POLISH))))
    SOLVER = os.environ.get("BENCH_SOLVER", "admm")
    # residual-based early exit: "none" disables; default per DEFAULT_EARLY_TOL
    _et = os.environ.get("BENCH_EARLY_TOL", str(DEFAULT_EARLY_TOL))
    EARLY_TOL = None if _et in ("none", "None", "") else float(_et)
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "float32"))

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, cfg = setup.to_device(dtype=dtype, iters=ITERS, iters2=ITERS2,
                                  alpha=ALPHA, rho2_scale=RHO2_SCALE,
                                  phase1_precision=P1PREC, polish=POLISH,
                                  solver=SOLVER, early_tol=EARLY_TOL)
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
    if n_dev > 1 and BATCH % n_dev == 0 and SOLVER != "pallas":
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

    # --- roofline / MFU accounting (model + measured wall time) ----------
    # FLOPs/bytes are exactly computable from the padded problem geometry
    # (parallel/roofline.py); the summary names the binding resource.
    from rtmpc_tpu.parallel.roofline import (admm_engine_model,
                                             device_peaks, roofline_summary)
    n_p = int(arrays.admm.Kinv.shape[0])
    m_p = int(arrays.admm.As.shape[0])
    ntheta = int(arrays.admm.Mq.shape[1])
    model = admm_engine_model(n_p, m_p, ntheta, ITERS + ITERS2, T, BATCH)
    roof = roofline_summary(model, dt_total, device_peaks(jax.devices()[0]))

    # --- latency, three honest granularities -----------------------------
    # compile each scan executable ONCE and share it across measurements
    # (remote compiles dominate wall time on a tunnel rig)
    refs1 = np.asarray(refs_np)
    w1 = np.asarray(w[0])
    th1, gm1 = np.asarray(theta[0]), np.asarray(gamma[0])
    step1 = jax.jit(make_rollout_fn(arrays, cfg, 1))
    chainT = jax.jit(make_rollout_fn(arrays, cfg, T))

    # (a) dispatch-inclusive per-step wall clock, the deployment number on
    # this rig (dominated here by the remote-TPU tunnel RPC round trip)
    lats = measure_step_latencies(arrays, cfg, refs1, w1, th1, gm1,
                                  step_fn=step1)
    p99_step_ms = float(np.quantile(lats, 0.99) * 1e3)
    p50_step_ms = float(np.median(lats) * 1e3)

    # (b) device-only per-step time (batch-1 chained rollout, back-to-back
    # steps on a warm device — excludes only the per-dispatch RPC)
    dev_step_s, dispatch_s = device_step_time(
        arrays, cfg, refs1, w1, th1, gm1, chain_fn=chainT, step_fn=step1)
    p99_step_device_ms = dev_step_s * 1e3   # median of reps; steps within
                                            # one scan are homogeneous

    # (b2) harness floor: the cheapest possible dispatch (scalar add) —
    # isolates the rig's RPC/framework round trip from anything this
    # framework does.  On the tunnel rig this is ~the whole dispatch
    # overhead; on locally-attached chips it is O(0.1 ms).
    nop = jax.jit(lambda v: v + 1.0)
    v0 = jnp.zeros(())
    nop(v0).block_until_ready()
    floor = []
    for _ in range(20):
        t0 = time.perf_counter()
        nop(v0).block_until_ready()
        floor.append(time.perf_counter() - t0)
    rpc_floor_ms = float(np.median(floor) * 1e3)

    # (c) amortized throughput figure (NOT a latency): wall time of one
    # batched step (all BATCH instances advance together) — the number a
    # Monte-Carlo sweep experiences per step
    step_amortized_ms = dt_total * 1e3 / T

    result = {
        "metric": f"closed-loop lossy-network tube-MPC rollouts/s (N=10, T={T})",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / 10000.0, 4),
        "qp_solves_per_s": round(qp_solves_per_s, 0),
        "p99_step_ms": round(p99_step_ms, 3),
        "p50_step_ms": round(p50_step_ms, 3),
        "step_device_ms": round(p99_step_device_ms, 3),
        "dispatch_overhead_ms": round(dispatch_s * 1e3, 3),
        "rpc_floor_ms": round(rpc_floor_ms, 3),
        "batched_step_amortized_ms": round(step_amortized_ms, 3),
        "realtime_budget_ms": 20.0,
        # p99_step_ms vs realtime_budget_ms is NOT a solver verdict on
        # this rig: the dispatch-inclusive path pays the remote-TPU
        # tunnel's RPC round trip every tick (rpc_floor_ms ~ the same
        # cost for a no-op dispatch).  The deployment-relevant figures
        # are step_device_ms (device-resident back-to-back step) and the
        # sustained 50 Hz serve session (SERVE log: p99 0.31 ms).
        "p99_note": ("dispatch-inclusive through the dev-rig tunnel; "
                     "rpc_floor_ms is the floor ANY dispatch pays here "
                     "- compare step_device_ms to the budget instead"),
        "batch": BATCH,
        "T": T,
        "solver": SOLVER,
        "admm_iters": ITERS,
        "admm_iters2": ITERS2,
        "alpha": ALPHA,
        "rho2_scale": RHO2_SCALE,
        "phase1_precision": P1PREC,
        "early_tol": EARLY_TOL,
        "polish": POLISH,
        "dtype": str(dtype),
        "matmul_precision": get_matmul_precision(),
        "feasible_frac": feasible_frac,
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
        **roof,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
