"""Paper Figs. 3a/3d reproduction: linearized cartpole Monte-Carlo sweep.

Equivalent of ``Results/results_linear_system.py``: robust tube tracking
MPC (RT-MPC) vs non-robust remote tracking MPC (R-MPC) over packet-loss
probabilities 0..0.9, N_MC runs x T=250 steps each, RMS tracking errors as
boxplot data, infeasibility counts for the non-robust arm, and solve-time
statistics — except the whole sweep runs as ONE batched computation per
arm instead of nested Python loops.
"""

import time

import numpy as np

from .common import (check, init_jax, make_parser, savefig,
                     save_summary_json, solver_kwargs,
                     solvetime_hist_figure)
from .scenarios import cartpole_scenario


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--n-mc", type=int, default=20)
    parser.add_argument("--no-cache", action="store_true")
    parser.add_argument("--checkpoint", default=None,
                        help="npz path for per-chunk sweep checkpointing; "
                             "re-run with the same path to resume")
    parser.add_argument("--n-chunks", type=int, default=None,
                        help="sweep chunks along the probability axis "
                             "(default: auto — one per probability for "
                             "the IP path on accelerators, else 1)")
    parser.add_argument("--save-json", default=None,
                        help="write the per-p mean-RMS rows + solver config "
                             "to this path (machine-readable evidence)")
    args = parser.parse_args(argv)
    # reference-grade accuracy by default on every backend: the
    # mixed-precision Riccati interior point (f32 path following + f64
    # polish, ops/ip_riccati.py) reproduces the f64 truth on this 4-D
    # geometry at ~1.4 ms/solve on TPU — inside the reference's own
    # 2.5-20 ms Clarabel histogram; --solver admm remains the opt-in
    # throughput mode, --solver ip the round-4 dense accuracy mode
    jax = init_jax(args, tpu_default_solver="ip_hybrid")
    import jax.numpy as jnp
    from ..models import setup_tracking, setup_tube_tracking
    from ..models.cache import cached_setup
    from ..parallel.mc import run_mc_sweep

    sc = cartpole_scenario()
    if args.quick:
        T, n_mc = 60, 4
        probs = [0.0, 0.3, 0.6, 0.9]
    else:
        T, n_mc = sc.T, args.n_mc
        probs = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]

    print("setting up tube-tracking controller (rpi_method=1, eq. 8d)...")
    t0 = time.time()
    tube = cached_setup(setup_tube_tracking, sc.A, sc.B, sc.Q, sc.R, sc.N,
                        sc.X, sc.U, sc.W, fixed_initial_state=True,
                        rpi_method=1, cache=not args.no_cache)
    track = cached_setup(setup_tracking, sc.A, sc.B, sc.Q, sc.R, sc.N,
                         sc.X, sc.U, cache=not args.no_cache)
    print(f"setup done in {time.time() - t0:.1f}s "
          f"(Z rows {tube.Z.nrows}, Xf rows {tube.Xf.nrows})")

    dtype = jnp.dtype(args.dtype)
    arrays_tube, cfg_tube = tube.to_device(dtype=dtype,
                                           **solver_kwargs(args, admm_iters=400))
    arrays_track, cfg_track = track.to_device(dtype=dtype,
                                              **solver_kwargs(args, admm_iters=400))

    refs = np.zeros((T, 4))
    refs[:, 0] = sc.ref_value
    key = jax.random.PRNGKey(args.seed)
    k_tube, k_track = jax.random.split(key)

    from .common import auto_chunks
    args.n_chunks = auto_chunks(args, probs, jax)
    print(f"running sweep: {len(probs)} probs x {n_mc} runs x {T} steps, "
          f"2 arms, {args.n_chunks} chunk(s)")
    ckpt = lambda arm: (f"{args.checkpoint}.{arm}" if args.checkpoint
                        else None)
    res_tube = run_mc_sweep(
        arrays_tube, cfg_tube, T=T, n_mc=n_mc, loss_probs=probs, refs=refs,
        x0=sc.x0, w_lo=sc.w_lo, w_hi=sc.w_hi, key=k_tube,
        actuator_mode="consistent", checkpoint_path=ckpt("tube"),
        n_chunks=args.n_chunks)
    # the same disturbance/loss key per arm mirrors the reference's shared
    # RNG streams across arms
    res_track = run_mc_sweep(
        arrays_track, cfg_track, T=T, n_mc=n_mc, loss_probs=probs,
        refs=refs, x0=sc.x0, w_lo=sc.w_lo, w_hi=sc.w_hi, key=k_tube,
        actuator_mode="smart", infeas_mode="certificate",
        checkpoint_path=ckpt("track"), n_chunks=args.n_chunks)

    n_solves = len(probs) * n_mc * T * 2
    per_solve_ms = 1e3 * (res_tube.wall_time_s + res_track.wall_time_s) \
        / n_solves
    print(f"wall time: tube {res_tube.wall_time_s:.2f}s + track "
          f"{res_track.wall_time_s:.2f}s for {n_solves} QP solves "
          f"({per_solve_ms:.4f} ms/solve amortized in the batched engine)")

    # Real per-step solve-time distribution (reference methodology:
    # wall-clock around each individual solve+packet step,
    # ``results_linear_system.py:304-320``) — one representative rollout
    # at p=0.4, one dispatch per control tick, dispatch-inclusive.
    from ..parallel.latency import measure_step_latencies, latency_report
    rng = np.random.default_rng(args.seed + 1)
    p_lat = 0.4
    th_l = (rng.uniform(size=T) >= p_lat).astype(np.int64)
    gm_l = (rng.uniform(size=T) >= p_lat).astype(np.int64)
    th_l[0] = gm_l[0] = 1
    w_l = rng.uniform(sc.w_lo, sc.w_hi, size=(T, 4))
    lat = measure_step_latencies(arrays_tube, cfg_tube, refs, w_l,
                                 th_l, gm_l, x0=sc.x0)
    stats = latency_report(lat, "per-step, dispatch-inclusive, RT-MPC")
    # the reference's Fig. 3d histogram figure
    # (``results_linear_system.py:397-404``)
    solvetime_hist_figure({"RT-MPC": stats},
                          "results_linear_solvetime_hist.png",
                          enabled=not args.no_figures)

    print("\nTracking-error summary (mean RMS per loss probability):")
    print("  p     RT-MPC (tube)   R-MPC (track)   track infeasible")
    rows = []
    for i, p in enumerate(probs):
        te_tube = np.nanmean(res_tube.tracking_error[i])
        tr = res_track.tracking_error[i]
        te_track = np.nanmean(tr) if not np.all(np.isnan(tr)) else np.nan
        rows.append({"p": float(p), "rms_tube": float(te_tube),
                     "rms_track": float(te_track),
                     "rms_tube_median":
                         float(np.nanmedian(res_tube.tracking_error[i])),
                     "rms_track_median":
                         float(np.nanmedian(tr)) if not np.all(np.isnan(tr))
                         else float("nan"),
                     "rms_tube_all": res_tube.tracking_error[i].tolist(),
                     "rms_track_all": tr.tolist(),
                     "track_infeasible":
                         int(res_track.infeasible_counts[i])})
        print(f"  {p:.1f}   {te_tube:12.5f} {te_track:15.5f} "
              f"{int(res_track.infeasible_counts[i]):8d}/{n_mc}")
    save_summary_json(args.save_json, {
        "app": "results_linear", "solver": args.solver,
        "dtype": args.dtype, "backend": jax.default_backend(),
        "n_mc": n_mc, "T": T, "seed": args.seed, "rows": rows,
        "solve_time_stats": stats})

    ok = check("tube arm always feasible", bool(res_tube.feasible.all()))
    # errors stay bounded and same order across loss probabilities (the
    # tube controller's whole point); strict monotonicity is noise-limited
    # at small N_MC
    e0 = float(np.nanmean(res_tube.tracking_error[0]))
    e9 = float(np.nanmean(res_tube.tracking_error[-1]))
    ok &= check("tube errors bounded across loss probabilities",
                0.3 * e0 < e9 < 3.0 * e0, f"p0 {e0:.4f} vs p0.9 {e9:.4f}")
    if not args.quick:
        # Fig. 3a behavior: the non-robust arm degrades with loss while the
        # tube arm stays flat.  NOTE on infeasibility counts: the reference
        # increments ``is_track_infeasible`` whenever Clarabel returns a
        # non-optimal status (``results_linear_system.py:268-271``) — which
        # on this benchmark's degenerate QPs includes NUMERICAL failures,
        # not only true infeasibility (our f64 oracle's Mehrotra provably
        # converges-then-stalls on such instances, utils/qp_ref.py).  The
        # f64 oracle finds every QP on these realizations feasible through
        # p=0.9, so certificate counts of 0 are correct here; the robust
        # discriminator is the error degradation ratio.
        e_track_hi = float(np.nanmean(res_track.tracking_error[6:8]))
        e_track_lo = float(np.nanmean(res_track.tracking_error[0]))
        e_tube_hi = float(np.nanmean(res_tube.tracking_error[6:8]))
        e_tube_lo = float(np.nanmean(res_tube.tracking_error[0]))
        deg_track = e_track_hi / e_track_lo
        deg_tube = e_tube_hi / e_tube_lo
        ok &= check(
            "non-robust arm degrades more at high loss (Fig. 3a behavior)",
            deg_track > deg_tube and deg_track > 1.2,
            f"R-MPC x{deg_track:.2f} vs RT-MPC x{deg_tube:.2f} "
            f"(infeasible counts {res_track.infeasible_counts.tolist()})")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        pos = np.arange(len(probs)) * 2.0
        bp1 = ax.boxplot([res_tube.tracking_error[i] for i in
                          range(len(probs))], positions=pos - 0.35,
                         widths=0.6, patch_artist=True, sym="x",
                         boxprops=dict(facecolor="C0"))
        # drop NaN (infeasible) runs like the reference's filtering
        # (``results_linear_system.py:334-339``); all-NaN becomes [nan]
        track_filtered = [
            res_track.tracking_error[i][
                ~np.isnan(res_track.tracking_error[i])]
            for i in range(len(probs))]
        track_filtered = [t if t.size else np.array([np.nan])
                          for t in track_filtered]
        bp2 = ax.boxplot(track_filtered, positions=pos + 0.35, widths=0.6,
                         patch_artist=True, sym="x",
                         boxprops=dict(facecolor="C1"))
        ax.set_xticks(pos)
        ax.set_xticklabels([f"{p:.1f}" for p in probs])
        ax.set_xlabel("Packet Loss Probability")
        ax.set_ylabel("Average Tracking Error")
        ax.legend([bp1["boxes"][0], bp2["boxes"][0]],
                  ["RT-MPC", "R-MPC"])
        savefig(fig, "results_linear_boxplot.png")

        # sample trajectories at p=0.4 (reference Fig. 3a inset style)
        pi = min(range(len(probs)), key=lambda i: abs(probs[i] - 0.4))
        fig2, (ax1, ax2) = plt.subplots(nrows=2, figsize=(8, 5))
        tgrid = sc.Th * np.arange(T)
        ax1.plot(tgrid, res_tube.sample_traj[pi, :, 0], "-.",
                 label="RT-MPC")
        ax1.plot(tgrid, res_track.sample_traj[pi, :, 0], "--",
                 label="R-MPC")
        ax1.axhline(sc.ref_value, color="k", lw=1, label="r(k)")
        ax1.set_ylabel("Position p [m]")
        ax1.legend(); ax1.grid()
        ax2.plot(tgrid, res_tube.sample_traj[pi, :, 2], "-.")
        ax2.plot(tgrid, res_track.sample_traj[pi, :, 2], "--")
        ax2.axhline(0.3, color="r"); ax2.axhline(-0.3, color="r")
        ax2.set_ylabel("Angle phi [rad]")
        ax2.set_xlabel("Time [s]")
        ax2.grid()
        savefig(fig2, "results_linear_trajectories.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
