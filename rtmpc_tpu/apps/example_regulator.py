"""Regulator MPC on the double integrator.

Equivalent of ``Examples of Model Predictive Controllers/
Example_of_Regulator_MPC.py``: A=[[1,1],[0,1]], B=[[0],[1]], N=10,
|u| <= 1, T=20 closed-loop steps from x0=(1,2) — regulate to the origin.
"""

import numpy as np

from .common import check_tol, solver_kwargs, check, init_jax, make_parser, savefig


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    from ..utils import box
    from ..models import setup_regulator
    from ..parallel.rollout import make_direct_rollout

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    N, T = 10, 20
    setup = setup_regulator(A, B, np.eye(2), np.eye(1), N,
                            U=box(np.array([1.0])))
    arrays, cfg = setup.to_device(dtype=jnp.dtype(args.dtype),
                                  **solver_kwargs(args))
    rollout = jax.jit(make_direct_rollout(arrays, cfg, T))
    x0 = np.array([1.0, 2.0])
    refs = jnp.zeros((T, 2), arrays.A.dtype)
    w = jnp.zeros((T, 2), arrays.A.dtype)
    (xT, _), (xs, us, _, _, rp, rd) = rollout(x0, refs, w)
    xs, us = np.asarray(xs), np.asarray(us)

    tol = check_tol(args)
    ok = True
    ok &= check("input constraints |u| <= 1",
                bool(np.all(np.abs(us) <= 1.0 + tol)),
                f"max |u| = {np.abs(us).max():.4f}")
    ok &= check("state regulated to origin",
                bool(np.linalg.norm(xs[-1]) < 1e-2),
                f"|x(T)| = {np.linalg.norm(xs[-1]):.2e}")
    ok &= check("QP residuals small", float(np.max(rp)) < 10 * tol,
                f"max r_prim = {float(np.max(rp)):.2e}")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax0, ax1) = plt.subplots(nrows=2, figsize=(7, 5))
        traj = np.vstack([x0[None], xs])
        ax0.step(range(T), us[:, 0], where="post", label="$u$")
        ax0.axhline(1, color="r", ls=":")
        ax0.axhline(-1, color="r", ls=":")
        ax0.legend(); ax0.grid()
        ax1.plot(range(T + 1), traj[:, 0], label="$x_1$")
        ax1.plot(range(T + 1), traj[:, 1], label="$x_2$")
        ax1.legend(); ax1.grid()
        savefig(fig, "example_regulator.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
