"""Tracking MPC with artificial steady state on the double integrator.

Equivalent of ``Example_of_Tracking_MPC.py``: state box |x| <= 8, input
|u| <= 1, piecewise reference [5, -9, 9, 4] (the -9/9 segments are outside
X, so the artificial steady state saturates at the feasible boundary),
T=120 steps, no disturbance, no network.
"""

import numpy as np

from .common import solver_kwargs, check, init_jax, make_parser, savefig


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    from ..utils import box
    from ..models import setup_tracking
    from ..parallel.rollout import make_direct_rollout

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    N = 10
    T = 40 if args.quick else 120
    setup = setup_tracking(A, B, np.eye(2), np.eye(1), N,
                           box(np.array([8.0, 8.0])), box(np.array([1.0])))
    arrays, cfg = setup.to_device(dtype=jnp.dtype(args.dtype),
                                  **solver_kwargs(args, admm_iters=400))
    rollout = jax.jit(make_direct_rollout(arrays, cfg, T))

    refs = np.zeros((T, 2))
    seg = T // 4
    refs[:seg, 0] = 5.0
    refs[seg:2 * seg, 0] = -9.0
    refs[2 * seg:3 * seg, 0] = 9.0
    refs[3 * seg:, 0] = 4.0

    x0 = np.array([1.0, 2.0])
    (xT, _), (xs, us, _, xbars, rp, rd) = rollout(
        x0, jnp.asarray(refs, arrays.A.dtype),
        jnp.zeros((T, 2), arrays.A.dtype))
    xs, us, xbars = np.asarray(xs), np.asarray(us), np.asarray(xbars)

    ok = True
    ok &= check("input constraints", bool(np.all(np.abs(us) <= 1 + 1e-4)),
                f"max |u| = {np.abs(us).max():.6f}")
    ok &= check("state constraints", bool(np.all(np.abs(xs) <= 8 + 1e-4)),
                f"max |x| = {np.abs(xs).max():.4f}")
    # artificial steady state saturates below the feasible boundary for
    # the infeasible references (8 is the box; xbar must stay < 8)
    sat = xbars[seg + 5:2 * seg, 0]
    ok &= check("steady state saturates for ref=-9",
                bool(np.all(sat > -8.1) and np.all(sat < -7.0)),
                f"xbar in [{sat.min():.3f}, {sat.max():.3f}]")
    ok &= check("tracks feasible reference 4",
                abs(xs[-1, 0] - 4.0) < 0.05,
                f"x1(T) = {xs[-1, 0]:.4f}")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax0, ax1) = plt.subplots(nrows=2, figsize=(7, 5))
        traj = np.vstack([x0[None], xs])
        ax0.step(range(T), us[:, 0], where="post", label="$u$")
        ax0.legend(); ax0.grid()
        ax1.plot(range(T + 1), traj[:, 0], label="$x_1$")
        ax1.plot(range(T), refs[:, 0], ":", label="$r$")
        ax1.plot(range(T), xbars[:, 0], "--", label=r"$\bar{x}_1$")
        ax1.legend(); ax1.grid()
        savefig(fig, "example_tracking.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
