"""Data-driven disturbance-set estimation for the cartpole.

Equivalent of ``Results/estimate_W_for_Cartpole.py``: stabilize the
*nonlinear* cartpole from random initial conditions with the LQR
controller of the linearized model (ZOH at 50 Hz over 500 Hz physics),
collect the 50 Hz residuals ``w(k) = x(k) - Acl x(k-1)`` (:94-107), and
report the per-dimension 2.5%-trimmed quantile box (:122-127) — the
``W`` used by the Results scenarios.  Unlike PyBullet, the analytic plant
is vmappable: all rollouts run as one batched scan.
"""

import numpy as np

from .common import check, init_jax, make_parser
from .scenarios import cartpole_scenario


def estimate_w_box(jax, jnp, sc, n_rollouts=100, T=150, seed=0,
                   method="semi_implicit_euler"):
    from ..utils.synthesis import dlqr
    from ..models.plants import cartpole_zoh_step

    K, _, _ = dlqr(sc.A, sc.B, sc.Q, sc.R)
    Acl = sc.A - sc.B @ K
    dt = jnp.float64

    Kj = jnp.asarray(K, dt)
    Aclj = jnp.asarray(Acl, dt)

    def rollout(x0):
        def step(x, _):
            u = -(Kj @ x)
            x_next = cartpole_zoh_step(sc.params, x, u[0], sc.Th,
                                       sc.physics_substeps, method=method)
            w = x_next - Aclj @ x
            return x_next, w

        _, ws = jax.lax.scan(step, x0, None, length=T)
        return ws

    key = jax.random.PRNGKey(seed)
    # random inits in a modest region around upright (reference draws
    # random stabilizable initial conditions)
    scale = jnp.asarray([0.5, 0.5, 0.15, 0.3], dt)
    x0s = jax.random.uniform(key, (n_rollouts, 4), dt, -1.0, 1.0) * scale
    ws = jax.jit(jax.vmap(rollout))(x0s)
    ws = np.asarray(ws).reshape(-1, 4)
    # 2.5%-trimmed quantile box per dimension (reference :122-127)
    lo = np.quantile(ws, 0.025, axis=0)
    hi = np.quantile(ws, 0.975, axis=0)
    return np.maximum(np.abs(lo), np.abs(hi)), ws


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--n-rollouts", type=int, default=100)
    args = parser.parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp

    sc = cartpole_scenario()
    n = 20 if args.quick else args.n_rollouts
    w_box, ws = estimate_w_box(jax, jnp, sc, n_rollouts=n,
                               T=60 if args.quick else 150,
                               seed=args.seed)
    names = ["pos", "vel", "ang", "ang_vel"]
    print("Estimated disturbance box (97.5% quantile of |w|):")
    for i, nm in enumerate(names):
        print(f"  w_{nm:8s} = {w_box[i]:.6f}   "
              f"(reference PyBullet value {sc.W.b[i]:.6f})")

    ok = check("residuals are small (linearization error at 50 Hz)",
               bool(np.all(w_box < 0.2)), f"max {w_box.max():.4f}")
    ok &= check("angular velocity dominates (as in reference)",
                int(np.argmax(w_box)) == 3)
    print("note: the analytic plant's residuals are ~40x smaller than "
          "PyBullet's (no contact/constraint-solver noise); scenarios can "
          "use either box via cartpole_scenario(w_box=...)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
