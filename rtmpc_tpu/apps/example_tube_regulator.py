"""Tube regulator MPC (Mayne 2005 Fig. 2 configuration).

Equivalent of ``Example_of_Tube_Regulator_MPC.py``: double integrator with
B=[[0.5],[1]], Q=I, R=0.01, N=9, disturbance |w| <= 0.1, constraints
x2 <= 2 (plus a loose box) and |u| <= 1; ancillary law
u = u*_0 - K (x - x*_nom0) keeps the disturbed state in a tube around the
nominal trajectory.
"""

import numpy as np

from .common import check_tol, solver_kwargs, check, init_jax, make_parser, savefig


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    from ..utils import Polytope, box, contains
    from ..models import setup_tube_regulator
    from ..protocol import draw_disturbances
    from ..parallel.rollout import make_direct_rollout

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.5], [1.0]])
    Q = np.eye(2)
    R = 0.01 * np.eye(1)
    N = 9
    T = 15 if args.quick else 30
    # Mayne's constraint x2 <= 2 plus a loose box to keep sets bounded
    X = Polytope(np.array([[0.0, 1.0], [0.0, -1.0],
                           [1.0, 0.0], [-1.0, 0.0]]),
                 np.array([2.0, 50.0, 50.0, 50.0]))
    U = box(np.array([1.0]))
    W = box(np.array([0.1, 0.1]))
    setup = setup_tube_regulator(A, B, Q, R, N, X, U, W)
    # R=0.01 makes this the worst-conditioned template; give the ADMM a
    # larger budget and representative probe parameters for rho tuning
    arrays, cfg = setup.to_device(
        dtype=jnp.dtype(args.dtype), **solver_kwargs(args, admm_iters=1500),
        probe_thetas=np.array([[-5.0, -2.0, 0.0, 0.0], [0.0, 0, 0, 0]]))
    rollout = jax.jit(make_direct_rollout(arrays, cfg, T, ancillary=True))

    key = jax.random.PRNGKey(args.seed)
    w = draw_disturbances(key, T, -0.1 * np.ones(2), 0.1 * np.ones(2))
    x0 = np.array([-5.0, -2.0])
    (xT, _), (xs, us, x_noms, _, rp, rd) = rollout(
        x0, jnp.zeros((T, 2), arrays.A.dtype), w.astype(arrays.A.dtype))
    xs, us, x_noms = np.asarray(xs), np.asarray(us), np.asarray(x_noms)
    traj = np.vstack([x0[None], xs])

    tol = check_tol(args)
    ok = check("input constraints", bool(np.all(np.abs(us) <= 1 + tol)),
               f"max |u| = {np.abs(us).max():.4f}")
    ok &= check("state constraint x2 <= 2",
                bool(np.all(traj[:, 1] <= 2 + 1e-4)),
                f"max x2 = {traj[:, 1].max():.4f}")
    in_tube = all(contains(setup.Z, traj[t] - x_noms[t], tol=tol)
                  for t in range(T))
    ok &= check("x - x_nom stays in the tube Z", in_tube)
    ok &= check("regulated near origin",
                np.linalg.norm(traj[-1]) < 0.5,
                f"|x(T)| = {np.linalg.norm(traj[-1]):.3f}")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 5))
        # per-step tube cross-sections around the nominal trajectory
        Vz = setup.Z.get_vertices()
        hullorder = np.argsort(np.arctan2(Vz[:, 1] - Vz[:, 1].mean(),
                                          Vz[:, 0] - Vz[:, 0].mean()))
        Vz = Vz[hullorder]
        for t in range(T):
            poly = Vz + x_noms[t]
            ax.fill(poly[:, 0], poly[:, 1], alpha=0.15, fc="g", ec="g")
        ax.plot(traj[:, 0], traj[:, 1], "x-", label="$x$")
        ax.plot(x_noms[:, 0], x_noms[:, 1], "+--", label="$x_{nom}$")
        ax.axhline(2.0, color="r")
        ax.legend(); ax.grid()
        savefig(fig, "example_tube_regulator.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
