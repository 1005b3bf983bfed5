"""Tube tracking MPC, no network (Limon 2010).

Equivalent of ``Example_of_Tube_Tracking_MPC.py``: double integrator,
|x| <= 8, |u| <= 1, |w| <= 0.1, piecewise reference [5, -9, 9, 4]; applies
the ancillary law u = u*_0 - K (x - x*_nom0) in the loop (ref :89) and
checks input-constraint satisfaction (ref :99-100).
"""

import numpy as np

from .common import check_tol, solver_kwargs, check, init_jax, make_parser, savefig


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    from ..utils import box, contains
    from ..models import setup_tube_tracking
    from ..protocol import draw_disturbances
    from ..parallel.rollout import make_direct_rollout

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    N = 10
    T = 40 if args.quick else 120
    setup = setup_tube_tracking(A, B, np.eye(2), np.eye(1), N,
                                box(np.array([8.0, 8.0])),
                                box(np.array([1.0])),
                                box(np.array([0.1, 0.1])))
    # iters sized for the worst case: the -9 -> +9 reference reversal
    # fully invalidates the warm start
    arrays, cfg = setup.to_device(dtype=jnp.dtype(args.dtype),
                                  **solver_kwargs(args, admm_iters=600))
    rollout = jax.jit(make_direct_rollout(arrays, cfg, T, ancillary=True))

    refs = np.zeros((T, 2))
    seg = T // 4
    refs[:seg, 0] = 5.0
    refs[seg:2 * seg, 0] = -9.0
    refs[2 * seg:3 * seg, 0] = 9.0
    refs[3 * seg:, 0] = 4.0

    key = jax.random.PRNGKey(args.seed)
    w = draw_disturbances(key, T, -0.1 * np.ones(2), 0.1 * np.ones(2))
    x0 = np.array([1.0, 2.0])
    _, (xs, us, x_noms, xbars, rp, rd) = rollout(
        x0, jnp.asarray(refs, arrays.A.dtype), w.astype(arrays.A.dtype))
    xs, us, x_noms = np.asarray(xs), np.asarray(us), np.asarray(x_noms)
    traj = np.vstack([x0[None], xs])

    tol = check_tol(args)
    ok = check("input constraints (ref :99-100)",
               bool(np.all(np.abs(us) <= 1 + tol)),
               f"max |u| = {np.abs(us).max():.4f}")
    ok &= check("state constraints", bool(np.all(np.abs(traj) <= 8 + 1e-4)),
                f"max |x| = {np.abs(traj).max():.4f}")
    viol = max(float(np.max(setup.Z.A @ (traj[t] - x_noms[t]) - setup.Z.b))
               for t in range(T))
    ok &= check("x - x_nom stays in the tube Z", viol < tol,
                f"max tube violation {viol:.2e}")
    ok &= check("tracks final feasible reference",
                abs(traj[-1, 0] - 4.0) < 0.3,
                f"x1(T) = {traj[-1, 0]:.3f}")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax0, ax1) = plt.subplots(nrows=2, figsize=(7, 5))
        ax0.step(range(T), us[:, 0], where="post", label="$u$")
        ax0.axhline(1, color="r", ls=":"); ax0.axhline(-1, color="r", ls=":")
        ax0.legend(); ax0.grid()
        ax1.plot(range(T + 1), traj[:, 0], label="$x_1$")
        ax1.plot(range(T), x_noms[:, 0], "--", label="$x_{nom,1}$")
        ax1.plot(range(T), refs[:, 0], ":", label="$r$")
        ax1.legend(); ax1.grid()
        savefig(fig, "example_tube_tracking.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
