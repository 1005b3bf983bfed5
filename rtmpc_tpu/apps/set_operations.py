"""Set-operation demos: the four ``Examples of Set Operations`` scripts.

Subcommands (``--demo all`` runs everything):

* ``ops``     — Minkowski sum / Pontryagin difference / matrix scaling
                (``Example of Several Set Operations.py``)
* ``rakovic`` — Rakovic Fig. 1 mRPI approximation, K=[1.17,1.03],
                eps=1.9e-5 (``Example of Approximation of mRPI_Rakovic.py``)
* ``darup``   — Darup Fig. 3 RPI with the k* = 5/6/10 known answers
                (``Example of Approximation of mRPI_Darup.py:50-55``)
* ``mayne``   — Mayne Fig. 2 terminal-set construction: tighten, build XU,
                Gilbert-Tan, Xf + Z
                (``Example of Output Admissible Set Calculation.py``)
"""

import numpy as np

from .common import check, init_jax, make_parser, savefig


def _plot_polys(polys_labels, name, enabled):
    if not enabled:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 5))
    for poly, label in polys_labels:
        V = poly.get_vertices()
        order = np.argsort(np.arctan2(V[:, 1] - V[:, 1].mean(),
                                      V[:, 0] - V[:, 0].mean()))
        V = np.vstack([V[order], V[order][:1]])
        ax.plot(V[:, 0], V[:, 1], label=label)
    ax.legend(); ax.grid()
    savefig(fig, name)


def demo_ops(args) -> bool:
    from ..utils import box, mink_sum, poly_equal, pont_diff, scale
    P1 = box(np.array([2.0, 2.0]))
    P2 = box(np.array([1.0, 1.0]))
    S = mink_sum(P1, P2)
    D = pont_diff(P1, P2)
    ok = check("mink_sum(box2, box1) == box3",
               poly_equal(S, box(np.array([3.0, 3.0]))))
    ok &= check("pont_diff(box2, box1) == box1",
                poly_equal(D, box(np.array([1.0, 1.0]))))
    th = np.pi / 6
    Rm = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    Rot = scale(P2, Rm)
    ok &= check("matrix scale preserves volume (rotation)",
                abs(_area(Rot) - _area(P2)) < 1e-6)
    _plot_polys([(P1, "P1"), (P2, "P2"), (S, "P1+P2"), (D, "P1-P2"),
                 (Rot, "R P2")], "set_operations.png",
                not args.no_figures)
    return ok


def _area(poly):
    V = poly.get_vertices()
    order = np.argsort(np.arctan2(V[:, 1] - V[:, 1].mean(),
                                  V[:, 0] - V[:, 0].mean()))
    V = V[order]
    x, y = V[:, 0], V[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def demo_rakovic(args) -> bool:
    from ..utils import box, poly_subset, scale
    from ..sets import mrpi_rakovic
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[1.0], [1.0]])
    K = np.array([[1.17, 1.03]])
    Acl = A - B @ K
    W = box(np.array([1.0, 1.0]))
    Z, status = mrpi_rakovic(Acl, W, eps_var=1.9e-5, s_max=60)
    ok = check("Rakovic mRPI converged", status == 0)
    from ..utils import mink_sum
    AZ_W = mink_sum(scale(Z, Acl), W)
    ok &= check("invariance Acl Z + W inside Z (within eps)",
                poly_subset(AZ_W, Z, tol=1e-3))
    _plot_polys([(Z, "F_inf (eps=1.9e-5)"), (W, "W")],
                "rakovic_mrpi.png", not args.no_figures)
    return ok


def demo_darup(args) -> bool:
    from ..utils import Polytope, box
    from ..utils.synthesis import dlqr
    from ..sets import rpi_darup
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.5], [1.0]])
    W = box(np.array([0.1, 0.1]))
    X = Polytope(np.vstack([np.eye(2), -np.eye(2)]),
                 np.array([4.0, 2.0, 8.0, 4.0]))
    U = box(np.array([1.0]))
    K, _, _ = dlqr(A, B, np.eye(2), np.eye(1))
    Acl = A - B @ K
    ok = True
    polys = []
    for eps, want in [(1e-1, 5), (1e-2, 6), (1e-3, 10)]:
        rpi, status = rpi_darup(Acl, W, X, U, K, eps_var=eps, s_max=50)
        ok &= check(f"Darup eps={eps:g} -> k*={want}",
                    status == 0 and rpi._k_star == want,
                    f"got k*={getattr(rpi, '_k_star', None)}")
        polys.append((rpi, f"P_inf eps={eps:g}"))
    _plot_polys(polys, "darup_rpi.png", not args.no_figures)
    return ok


def demo_mayne(args) -> bool:
    from ..utils import Polytope, box, contains, mink_sum, poly_subset, scale
    from ..sets import determine_mrpi, max_admissible_set, \
        tighten_constraints
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.5], [1.0]])
    Q, R = np.eye(2), 0.01 * np.eye(1)
    from ..utils.synthesis import dlqr
    K, _, _ = dlqr(A, B, Q, R)
    Acl = A - B @ K
    X = Polytope(np.array([[0.0, 1.0], [0.0, -1.0],
                           [1.0, 0.0], [-1.0, 0.0]]),
                 np.array([2.0, 50.0, 50.0, 50.0]))
    U = box(np.array([1.0]))
    W = box(np.array([0.1, 0.1]))
    Z = determine_mrpi(Acl, W)
    Xc, Uc = tighten_constraints(X, U, Z, K)
    XU = Polytope(np.vstack([Xc.A, -Uc.A @ K]),
                  np.concatenate([Xc.b, Uc.b]))
    Xf = max_admissible_set(Acl, XU)
    XfpZ = mink_sum(Xf, Z)
    ok = check("Xf invariant under Acl", poly_subset(scale(Xf, Acl), Xf,
                                                     tol=1e-6))
    ok &= check("Xf inside tightened constraints", poly_subset(Xf, XU))
    ok &= check("Xf + Z inside X", poly_subset(XfpZ, X, tol=1e-6))
    ok &= check("origin in Xf", contains(Xf, np.zeros(2)))
    _plot_polys([(X, "X"), (Xf, "Xf"), (XfpZ, "Xf+Z"), (Z, "Z")],
                "mayne_sets.png", not args.no_figures)
    return ok


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--demo", default="all",
                        choices=["all", "ops", "rakovic", "darup", "mayne"])
    args = parser.parse_args(argv)
    init_jax(args)
    demos = {"ops": demo_ops, "rakovic": demo_rakovic,
             "darup": demo_darup, "mayne": demo_mayne}
    names = list(demos) if args.demo == "all" else [args.demo]
    ok = True
    for n in names:
        print(f"--- {n} ---")
        ok &= demos[n](args)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
