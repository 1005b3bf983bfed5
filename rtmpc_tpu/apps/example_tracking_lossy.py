"""Remote tracking MPC over a lossy network (Pezzutto 2022 protocol).

Equivalent of ``Example_of_Tracking_MPC_Over_Lossy_Network.py``: the
tracking MPC of ``example_tracking`` plus Estimator + SmartActuator with
70% packet loss in both directions; checks Proposition 1 of Pezzutto
(estimation error zero whenever Theta_t == 1, ref :141-156).
"""

import numpy as np

from .common import solver_kwargs, check, init_jax, make_parser, savefig


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    from ..utils import box
    from ..models import setup_tracking
    from ..protocol import draw_loss_masks
    from ..parallel.rollout import make_rollout_fn

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    N = 10
    T = 40 if args.quick else 120
    setup = setup_tracking(A, B, np.eye(2), np.eye(1), N,
                           box(np.array([8.0, 8.0])), box(np.array([1.0])))
    arrays, cfg = setup.to_device(dtype=jnp.dtype(args.dtype),
                                  **solver_kwargs(args))
    rollout = jax.jit(make_rollout_fn(arrays, cfg, T, actuator_mode="smart"))

    refs = np.zeros((T, 2))
    seg = T // 4
    refs[:seg, 0] = 5.0
    refs[seg:2 * seg, 0] = -9.0
    refs[2 * seg:3 * seg, 0] = 9.0
    refs[3 * seg:, 0] = 4.0

    key = jax.random.PRNGKey(args.seed)
    theta, gamma = draw_loss_masks(key, T, 0.7, 0.7)
    x0 = np.array([1.0, 2.0])
    carry, outs = rollout(
        jnp.asarray(x0, arrays.A.dtype), jnp.asarray(refs, arrays.A.dtype),
        jnp.zeros((T, 2), arrays.A.dtype), theta, gamma)
    xs = np.asarray(outs.x)
    xh = np.asarray(outs.x_hat)
    Th = np.asarray(outs.Theta)
    traj = np.vstack([x0[None], xs])  # x_t for t = 0..T

    # Proposition 1: e_t = x_t - x_hat_t == 0 whenever Theta_t == 1
    errs = [np.abs(traj[t] - xh[t]).max() for t in range(T) if Th[t] == 1]
    ok = check("Proposition 1: zero estimation error when Theta=1",
               len(errs) > 0 and max(errs) < 1e-6,
               f"{len(errs)} consistent steps, max err {max(errs):.2e}")
    ok &= check("delivery stats sane",
                0.1 < float(np.asarray(theta).mean()) < 0.6,
                f"theta rate {float(np.asarray(theta).mean()):.2f}")
    ok &= check("tracks final feasible reference",
                abs(xs[-1, 0] - 4.0) < 0.5, f"x1(T) = {xs[-1, 0]:.3f}")

    if not args.no_figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax0, ax1) = plt.subplots(nrows=2, figsize=(7, 5))
        ax0.plot(range(T + 1), traj[:, 0], label="$x_1$")
        ax0.plot(range(T), xh[:, 0], "--", label=r"$\hat{x}_1$")
        ax0.plot(range(T), refs[:, 0], ":", label="$r$")
        ax0.legend(); ax0.grid()
        ax1.step(range(T), Th, where="post", label=r"$\Theta_t$")
        ax1.step(range(T), np.asarray(theta), where="post", alpha=0.4,
                 label=r"$\theta_t$")
        ax1.legend(); ax1.grid()
        savefig(fig, "example_tracking_lossy.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
