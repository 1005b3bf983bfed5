"""On-device f32 parity gate (run on the real TPU each round).

Proves the configuration the bench actually measures — float32,
``matmul_precision=high``, 60 ADMM iterations, no polish — against the
independent float64 NumPy protocol oracle (``tests/oracle_protocol.py``),
plus compiled (NOT interpret-mode) Pallas-kernel parity and on-device
invariant checks (Proposition 1, tube membership).

Writes ``PARITY_TPU_r<N>.json`` at the repo root and exits non-zero on any
gate failure, so it double-duties as a CI-for-hardware script:

    python tools/tpu_checks.py            # default backend (TPU)
    python tools/tpu_checks.py --round 2

Oracle reference: the reference's own runtime checks at
``Example_of_Tube_Tracking_MPC_Over_Lossy_Network.py:115-184``.
"""

import argparse
import json
import os
import sys
import warnings

import numpy as np

# the f64 IP oracle deliberately drives its barrier stiff near convergence;
# scipy's rcond warnings there are expected (accuracy is residual-checked)
warnings.filterwarnings("ignore", message=".*ill-conditioned matrix.*")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

PASS = True


def check(name, ok, detail=""):
    global PASS
    print(f"[{'PASS' if ok else 'FAIL'}] {name}"
          + (f" — {detail}" if detail else ""))
    PASS = PASS and bool(ok)
    return bool(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--iters", type=int, default=None,
                    help="defaults to the bench default (bench.DEFAULT_ITERS)")
    ap.add_argument("--iters2", type=int, default=None)
    ap.add_argument("--precision", default="high",
                    choices=["high", "highest"])
    ap.add_argument("--platform", default=None,
                    help="jax platform override (logic smoke tests on "
                         "'cpu'; the real gate runs on the TPU default)")
    args = ap.parse_args()
    import bench
    if args.iters is None:
        args.iters = bench.DEFAULT_ITERS
    if args.iters2 is None:
        args.iters2 = bench.DEFAULT_ITERS2
    # the full bench-default solver config (two-phase rho schedule)
    solver_kw = dict(iters=args.iters, iters2=args.iters2,
                     alpha=bench.DEFAULT_ALPHA,
                     rho2_scale=bench.DEFAULT_RHO2_SCALE,
                     phase1_precision=bench.DEFAULT_PHASE1_PRECISION)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from rtmpc_tpu.ops.precision import set_matmul_precision
    set_matmul_precision(args.precision)

    from rtmpc_tpu.utils import box
    from rtmpc_tpu.utils.polytope import contains
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.ops.qp import admm_solve, init_admm_state
    from rtmpc_tpu.ops.qp_pallas import admm_solve_pallas
    from rtmpc_tpu.parallel import make_batched_rollout
    from rtmpc_tpu.parallel.rollout import make_rollout_fn
    from oracle_protocol import run_oracle_rollout

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon") or "TPU" in str(dev)
    print(f"device: {dev}  precision: {args.precision}  "
          f"iters: {args.iters}")
    result = {"device": str(dev), "precision": args.precision,
              "dtype": "float32", **{k: v for k, v in solver_kw.items()}}

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    arrays, cfg = setup.to_device(dtype=jnp.float32, **solver_kw)
    _, cfg_pal = setup.to_device(dtype=jnp.float32, **solver_kw,
                                 solver="pallas", pallas_block=512)
    spec = arrays.admm

    # compiled (non-interpret) Pallas only exists on the TPU backend; the
    # --platform cpu smoke mode skips those sections (they stay gated on
    # the real hardware run that writes the round artifact)
    skip_pallas = jax.default_backend() == "cpu"

    # ---- 1. compiled Pallas kernel parity (no interpret) ----------------
    if not skip_pallas:
        rng = np.random.default_rng(0)
        Bk = 512
        th = jnp.asarray(rng.uniform(-2, 2, (Bk, 4)), jnp.float32)
        xla_fn = jax.jit(jax.vmap(
            lambda t: admm_solve(spec, t, init_admm_state(spec),
                                 iters=args.iters)))
        pal_fn = jax.jit(lambda t: admm_solve_pallas(spec, t,
                                                     iters=args.iters,
                                                     block_b=256))
        ref = xla_fn(th)
        pal = pal_fn(th)
        kerr = float(jnp.max(jnp.abs(pal.z_primal - ref.z_primal)))
        result["pallas_kernel_max_abs_err"] = kerr
        # HIGHEST: both backends compute exact-f32 contractions -> tight.
        # HIGH: XLA's native 3-pass vs the kernel's manual 3-pass bf16
        # round differently per partial product; after `iters`
        # contractions the envelope is ~1e-3 (both are equally valid HIGH
        # arithmetic).
        ktol = 1e-4 if args.precision == "highest" else 5e-3
        check(f"compiled pallas kernel parity vs XLA (atol {ktol:g})",
              kerr < ktol, f"max|dz| = {kerr:.2e}")

    # ---- 2. bench-config f32 rollout vs f64 oracle -----------------------
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
    assert oracle["feasible"] and oracle["steps"] == T

    fn = jax.jit(make_rollout_fn(arrays, cfg, T))
    carry, outs = fn(jnp.asarray(x0, jnp.float32),
                     jnp.asarray(refs, jnp.float32),
                     jnp.asarray(w, jnp.float32),
                     jnp.asarray(theta, jnp.int32),
                     jnp.asarray(gamma, jnp.int32))
    outs = jax.tree_util.tree_map(np.asarray, outs)
    terr = float(np.max(np.abs(outs.x - oracle["x"])))
    uerr = float(np.max(np.abs(outs.u - oracle["u"])))
    result["rollout_traj_max_abs_err"] = terr
    result["rollout_u_max_abs_err"] = uerr
    check("f32 bench-config trajectory parity vs f64 oracle (atol 5e-3)",
          terr < 5e-3, f"max|dx| = {terr:.2e}, max|du| = {uerr:.2e}")
    check("consistency indicator Theta exact match",
          bool(np.array_equal(outs.Theta, oracle["Theta"])))
    check("rollout stays feasible on device", bool(carry.feasible))

    # invariant checks ON THE DEVICE OUTPUTS (reference :165-184)
    Z = setup.Z
    e = outs.x_hat - np.vstack([x0, outs.x[:-1]])
    prop1_ok = all(contains(Z, e[t], tol=5e-3)
                   for t in range(T) if outs.Theta[t] == 1)
    check("Proposition 1 on-device: e in Z when Theta=1", prop1_ok,
          f"{int(outs.Theta.sum())} consistent steps")
    # x_nom reported at step t is the PRE-advance nominal state, so the
    # tube invariant pairs the post-step state x_{t+1} (= outs.x[t]) with
    # x_nom_{t+1} (= outs.x_nom[t+1])
    tube_ok = all(contains(Z, outs.x[t] - outs.x_nom[t + 1], tol=5e-3)
                  for t in range(T - 1))
    check("tube membership on-device: x - x_nom in Z", tube_ok)

    # ---- 2b. BATCHED vmapped-XLA rollout vs oracle ------------------------
    # Guards the unbatched-vs-batched arithmetic trap: an unbatched matvec
    # runs exact-f32 on the VPU, the same op under vmap is a matmul on the
    # MXU at the configured precision — a config can look perfect in the
    # per-element check above and diverge in the production batched engine
    # (observed: single-pass-bf16 phase 1 hit 1e28 at step 1 only when
    # batched).  Element 0 of a 64-wide batch must match the oracle.
    Bb = 64
    roll_x = jax.jit(make_batched_rollout(arrays, cfg, T))
    rep = lambda a, dt: jnp.broadcast_to(
        jnp.asarray(a, dt), (Bb,) + np.asarray(a).shape)
    carry_b, outs_b = roll_x(rep(x0, jnp.float32), rep(refs, jnp.float32),
                             rep(w, jnp.float32), rep(theta, jnp.int32),
                             rep(gamma, jnp.int32))
    xs_b = np.asarray(outs_b.x)
    berr = float(np.max(np.abs(xs_b - oracle["x"][None])))
    result["batched_rollout_traj_max_abs_err"] = berr
    check("BATCHED vmapped-XLA rollout parity vs oracle (atol 5e-3)",
          berr < 5e-3, f"max|dx| = {berr:.2e}")
    check("batched rollout stays feasible on device",
          bool(np.asarray(carry_b.feasible).all()))

    # ---- 3. compiled pallas-mode batched rollout vs oracle ---------------
    if not skip_pallas:
        Bb = 64
        roll_pal = jax.jit(make_batched_rollout(arrays, cfg_pal, T))
        rep = lambda a, dt: jnp.broadcast_to(
            jnp.asarray(a, dt), (Bb,) + np.asarray(a).shape)
        carry_p, outs_p = roll_pal(rep(x0, jnp.float32),
                                   rep(refs, jnp.float32),
                                   rep(w, jnp.float32),
                                   rep(theta, jnp.int32),
                                   rep(gamma, jnp.int32))
        xs_p = np.asarray(outs_p.x)
        perr = float(np.max(np.abs(xs_p - oracle["x"][None])))
        result["pallas_rollout_traj_max_abs_err"] = perr
        check("compiled pallas-mode rollout parity vs oracle (atol 5e-3)",
              perr < 5e-3, f"max|dx| = {perr:.2e}")
        check("pallas-mode rollout batch identical across elements",
              float(np.max(np.abs(xs_p - xs_p[0:1]))) == 0.0)

    # ---- 4. cartpole geometry (4-D, N=20, the Results-apps benchmark) ----
    # The round-3 verdict's gap: all cartpole accuracy claims rested on CPU
    # tests.  This section runs the actual benchmark geometry on device:
    # (a) the f32 Ruiz-scaled IP (the Results apps' TPU default) must
    #     reproduce the f64 oracle trajectory (~2e-2 envelope, ACCURACY.md);
    # (b) the ADMM throughput mode must hold the robustness invariants
    #     (tube membership, Proposition 1) even where its QP residuals
    #     plateau (~1e-2 on this geometry).
    # Reference geometry: ``/root/reference/Results/results_linear_system.py:26-163``.
    from rtmpc_tpu.apps.scenarios import cartpole_scenario
    from rtmpc_tpu.models.cache import cached_setup
    from rtmpc_tpu.models import setup_tube_tracking as _stt

    sc = cartpole_scenario()
    cp = cached_setup(_stt, sc.A, sc.B, sc.Q, sc.R, sc.N, sc.X, sc.U, sc.W,
                      fixed_initial_state=True, rpi_method=1)
    Tc = 60
    rng = np.random.default_rng(11)
    th_c = (rng.uniform(size=Tc) >= 0.4).astype(np.int64)
    gm_c = (rng.uniform(size=Tc) >= 0.4).astype(np.int64)
    th_c[0] = gm_c[0] = 1
    w_c = rng.uniform(sc.w_lo, sc.w_hi, size=(Tc, 4))
    refs_c = np.zeros((Tc, 4))
    refs_c[:, 0] = sc.ref_value

    oracle_c = run_oracle_rollout(cp, sc.x0, refs_c, w_c, th_c, gm_c)
    assert oracle_c["feasible"] and oracle_c["steps"] == Tc

    # (a) IP accuracy mode — the Results apps' TPU solver
    arr_ip, cfg_ip = cp.to_device(dtype=jnp.float32, solver="ip",
                                  ip_iters=30)
    fn_ip = jax.jit(make_rollout_fn(arr_ip, cfg_ip, Tc))
    _, outs_ip = fn_ip(jnp.asarray(sc.x0, jnp.float32),
                       jnp.asarray(refs_c, jnp.float32),
                       jnp.asarray(w_c, jnp.float32),
                       jnp.asarray(th_c, jnp.int32),
                       jnp.asarray(gm_c, jnp.int32))
    outs_ip = jax.tree_util.tree_map(np.asarray, outs_ip)
    from rtmpc_tpu.parallel.rollout import tracking_error_rms
    cerr = float(np.max(np.abs(outs_ip.x - oracle_c["x"])))
    cmed = float(np.median(np.max(np.abs(outs_ip.x - oracle_c["x"]),
                                  axis=1)))
    rms_dev = float(np.asarray(tracking_error_rms(
        jnp.asarray(sc.x0), jnp.asarray(outs_ip.x), jnp.asarray(refs_c))))
    rms_orc = float(np.asarray(tracking_error_rms(
        jnp.asarray(sc.x0), jnp.asarray(oracle_c["x"]),
        jnp.asarray(refs_c))))
    drel = abs(rms_dev - rms_orc) / rms_orc
    result["cartpole_ip_traj_max_abs_err"] = cerr
    result["cartpole_ip_traj_median_step_err"] = cmed
    result["cartpole_ip_rms_rel_err"] = drel
    # Gate on the benchmark's own statistic (RMS tracking error, the
    # Results apps' reported number) at the 2% criterion, plus a
    # median per-step bound; max|dx| is recorded but only sanity-bounded —
    # a single near-threshold f32 event diverges trajectories pointwise
    # (measured: identical max|dx| at 30 and 50 IP iterations, so it is
    # closed-loop f32 divergence, not solver accuracy).
    check("cartpole 4-D N=20: f32 IP on-device RMS tracking error within "
          "2% of f64 oracle", drel < 0.02,
          f"rms {rms_dev:.6f} vs {rms_orc:.6f} (drel {drel:.4f})")
    check("cartpole IP: median per-step |dx| < 1e-2", cmed < 1e-2,
          f"median {cmed:.2e}, max {cerr:.2e}")
    check("cartpole IP: max |dx| sanity bound (0.15)", cerr < 0.15)
    check("cartpole IP: Theta exact match",
          bool(np.array_equal(outs_ip.Theta, oracle_c["Theta"])))

    # (a2) hybrid accuracy mode — the Results apps' TPU default since r5:
    # f32 Riccati path following + f64 polish (ops/ip_riccati.py) must
    # land ON the f64 oracle, not merely near it
    jax.config.update("jax_enable_x64", True)
    arr_hy, cfg_hy = cp.to_device(dtype=jnp.float32, solver="ip_hybrid",
                                  ip_iters=25, ip_hybrid_iters=20)
    fn_hy = jax.jit(make_rollout_fn(arr_hy, cfg_hy, Tc))
    _, outs_hy = fn_hy(jnp.asarray(sc.x0, jnp.float32),
                       jnp.asarray(refs_c, jnp.float32),
                       jnp.asarray(w_c, jnp.float32),
                       jnp.asarray(th_c, jnp.int32),
                       jnp.asarray(gm_c, jnp.int32))
    outs_hy = jax.tree_util.tree_map(np.asarray, outs_hy)
    herr = float(np.max(np.abs(outs_hy.x - oracle_c["x"])))
    hmed = float(np.median(np.max(np.abs(outs_hy.x - oracle_c["x"]),
                                  axis=1)))
    rms_hy = float(np.asarray(tracking_error_rms(
        jnp.asarray(sc.x0), jnp.asarray(outs_hy.x), jnp.asarray(refs_c))))
    hdrel = abs(rms_hy - rms_orc) / rms_orc
    result["cartpole_hybrid_traj_max_abs_err"] = herr
    result["cartpole_hybrid_traj_median_step_err"] = hmed
    result["cartpole_hybrid_rms_rel_err"] = hdrel
    check("cartpole 4-D N=20: HYBRID Riccati IP on-device RMS within 0.5% "
          "of f64 oracle", hdrel < 0.005,
          f"rms {rms_hy:.6f} vs {rms_orc:.6f} (drel {hdrel:.5f})")
    check("cartpole hybrid: median per-step |dx| < 1e-3", hmed < 1e-3,
          f"median {hmed:.2e}, max {herr:.2e}")
    check("cartpole hybrid: Theta exact match",
          bool(np.array_equal(outs_hy.Theta, oracle_c["Theta"])))

    # ---- 5. EXTENDED arm on device vs f64 oracle (round-5 ask) -----------
    # Two-QP selection on prev_gamma + RobustEstimator + x_nom reset
    # (reference ``TubeTrackingMPC.py:307-349``, ``Estimator.py:113-156``),
    # previously exercised on hardware only inside sweep apps.
    from rtmpc_tpu.models import setup_extended_tube_tracking
    ext = setup_extended_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    Te = 100
    rng = np.random.default_rng(23)
    th_e = (rng.uniform(size=Te) >= 0.5).astype(np.int64)
    gm_e = (rng.uniform(size=Te) >= 0.5).astype(np.int64)
    th_e[0] = gm_e[0] = 1
    w_e = rng.uniform(-0.1, 0.1, size=(Te, 2))
    refs_e = np.zeros((Te, 2))
    refs_e[:Te // 2, 0] = 5.0
    refs_e[Te // 2:, 0] = -6.0
    oracle_e = run_oracle_rollout(ext, np.zeros(2), refs_e, w_e, th_e, gm_e)
    assert oracle_e["feasible"] and oracle_e["steps"] == Te

    # accuracy mode (hybrid) — tight parity
    arr_eh, cfg_eh = ext.to_device(dtype=jnp.float32, solver="ip_hybrid",
                                   ip_iters=25, ip_hybrid_iters=20)
    fn_eh = jax.jit(make_rollout_fn(arr_eh, cfg_eh, Te))
    carry_eh, outs_eh = fn_eh(jnp.zeros(2, jnp.float32),
                              jnp.asarray(refs_e, jnp.float32),
                              jnp.asarray(w_e, jnp.float32),
                              jnp.asarray(th_e, jnp.int32),
                              jnp.asarray(gm_e, jnp.int32))
    outs_eh = jax.tree_util.tree_map(np.asarray, outs_eh)
    eerr = float(np.max(np.abs(outs_eh.x - oracle_e["x"])))
    euerr = float(np.max(np.abs(outs_eh.u - oracle_e["u"])))
    result["extended_hybrid_traj_max_abs_err"] = eerr
    result["extended_hybrid_u_max_abs_err"] = euerr
    check("EXTENDED arm (two-QP + RobustEstimator) on-device trajectory "
          "parity vs f64 oracle (atol 5e-3)", eerr < 5e-3,
          f"max|dx| = {eerr:.2e}, max|du| = {euerr:.2e}")
    check("extended: Theta exact match",
          bool(np.array_equal(outs_eh.Theta, oracle_e["Theta"])))
    check("extended: rollout stays feasible on device",
          bool(np.asarray(carry_eh.feasible)))
    # tube membership with the extended actuator's nominal resets
    Ze = ext.Z
    tube_ok_e = all(contains(Ze, outs_eh.x[t] - outs_eh.x_nom[t + 1],
                             tol=5e-3) for t in range(Te - 1))
    check("extended: tube membership x - x_nom in Z on device", tube_ok_e)

    # throughput mode (bench ADMM config) — same protocol, looser parity
    arr_ea, cfg_ea = ext.to_device(dtype=jnp.float32, **solver_kw)
    fn_ea = jax.jit(make_rollout_fn(arr_ea, cfg_ea, Te))
    carry_ea, outs_ea = fn_ea(jnp.zeros(2, jnp.float32),
                              jnp.asarray(refs_e, jnp.float32),
                              jnp.asarray(w_e, jnp.float32),
                              jnp.asarray(th_e, jnp.int32),
                              jnp.asarray(gm_e, jnp.int32))
    outs_ea = jax.tree_util.tree_map(np.asarray, outs_ea)
    eaerr = float(np.max(np.abs(outs_ea.x - oracle_e["x"])))
    result["extended_admm_traj_max_abs_err"] = eaerr
    check("extended ADMM (bench config) trajectory parity vs oracle "
          "(atol 5e-2)", eaerr < 5e-2, f"max|dx| = {eaerr:.2e}")

    # (b) ADMM throughput mode — robustness invariants only (its residuals
    # plateau ~1e-2 on this geometry; accuracy claims are IP-only)
    arr_ad, cfg_ad = cp.to_device(dtype=jnp.float32, iters=200, iters2=200,
                                  alpha=1.8, rho2_scale=0.2)
    fn_ad = jax.jit(make_rollout_fn(arr_ad, cfg_ad, Tc))
    carry_ad, outs_ad = fn_ad(jnp.asarray(sc.x0, jnp.float32),
                              jnp.asarray(refs_c, jnp.float32),
                              jnp.asarray(w_c, jnp.float32),
                              jnp.asarray(th_c, jnp.int32),
                              jnp.asarray(gm_c, jnp.int32))
    outs_ad = jax.tree_util.tree_map(np.asarray, outs_ad)
    Zc = cp.Z
    tube_tol = 5e-3
    tube_ok_c = all(contains(Zc, outs_ad.x[t] - outs_ad.x_nom[t + 1],
                             tol=tube_tol) for t in range(Tc - 1))
    check("cartpole ADMM: tube membership x - x_nom in Z on device",
          tube_ok_c)
    e_c = outs_ad.x_hat - np.vstack([sc.x0, outs_ad.x[:-1]])
    prop1_c = all(contains(Zc, e_c[t], tol=tube_tol)
                  for t in range(Tc) if outs_ad.Theta[t] == 1)
    check("cartpole ADMM: Proposition 1 (e in Z when Theta=1) on device",
          prop1_c)
    check("cartpole ADMM: rollout stays feasible on device",
          bool(np.asarray(carry_ad.feasible)))
    admm_err = float(np.max(np.abs(outs_ad.x - oracle_c["x"])))
    result["cartpole_admm_traj_max_abs_err"] = admm_err  # recorded, ungated

    result["pass"] = PASS
    out = os.path.join(_ROOT, f"PARITY_TPU_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")
    return 0 if PASS else 1


if __name__ == "__main__":
    raise SystemExit(main())
