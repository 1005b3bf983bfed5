"""Cartpole rollout animations (GIF) for the controller arms.

Equivalent of ``Results/create_animations.py``: a single nonlinear-plant
rollout at p=0.4 per controller arm, rendered to an animated GIF.  The
PyBullet offscreen renderer (``cartpole.py:48-79``) is replaced by a
matplotlib cart+pole drawing rendered via Agg and assembled with PIL.
"""

import numpy as np

from .common import solver_kwargs, RESULTS_DIR, check, init_jax, make_parser
from .scenarios import cartpole_scenario


def render_gif(traj, Th, path, title, every=2):
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    frames = []
    l = 0.5
    for t in range(0, traj.shape[0], every):
        p, _, phi, _ = traj[t]
        fig, ax = plt.subplots(figsize=(4, 2.6), dpi=80)
        ax.plot([-1.5, 1.5], [0, 0], "k-", lw=1)
        ax.add_patch(plt.Rectangle((p - 0.15, -0.05), 0.3, 0.1,
                                   fc="C0"))
        # phi measured from upright
        tip = (p + 2 * l * np.sin(phi), 2 * l * np.cos(phi))
        ax.plot([p, tip[0]], [0.05, tip[1]], "C1-", lw=3)
        ax.plot(tip[0], tip[1], "C1o", ms=8)
        ax.set_xlim(-1.5, 1.5)
        ax.set_ylim(-0.3, 1.3)
        ax.set_aspect("equal")
        ax.set_title(f"{title}  t={t * Th:.2f}s")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())
        frames.append(Image.fromarray(buf[:, :, :3]))
        plt.close(fig)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:], loop=0,
                   duration=int(1000 * Th * every))
    print(f"[gif] {path} ({len(frames)} frames)")
    return frames


def render_strip(frames, path, n=8):
    """Horizontal strip of n equally-spaced frames — the committable
    still-image form of the GIF evidence (GIFs are working artifacts in
    the gitignored results/; the strip goes under figures_r*/)."""
    import os
    import numpy as np
    from PIL import Image
    idx = np.linspace(0, len(frames) - 1, n).astype(int)
    imgs = [frames[i] for i in idx]
    wsum = sum(im.width for im in imgs)
    strip = Image.new("RGB", (wsum, imgs[0].height), "white")
    xoff = 0
    for im in imgs:
        strip.paste(im, (xoff, 0))
        xoff += im.width
    os.makedirs(os.path.dirname(path), exist_ok=True)
    strip.save(path)
    print(f"[strip] {path} ({n} frames)")


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--loss-prob", type=float, default=0.4)
    parser.add_argument("--no-cache", action="store_true")
    parser.add_argument("--strip-dir", default=None,
                        help="also write an n-frame strip PNG per arm to "
                             "this directory (committable evidence)")
    args = parser.parse_args(argv)
    jax = init_jax(args)
    import jax.numpy as jnp
    import os
    from ..models import setup_tracking, setup_tube_tracking
    from ..models.cache import cached_setup
    from ..protocol import draw_disturbances, draw_loss_masks
    from ..parallel.rollout import make_rollout_fn
    from .results_nonlinear import build_nonlinear_plant_step

    sc = cartpole_scenario()
    T = 60 if args.quick else sc.T
    tube = cached_setup(setup_tube_tracking, sc.A, sc.B, sc.Q, sc.R, sc.N,
                        sc.X, sc.U, sc.W, fixed_initial_state=True,
                        rpi_method=1, cache=not args.no_cache)
    track = cached_setup(setup_tracking, sc.A, sc.B, sc.Q, sc.R, sc.N,
                         sc.X, sc.U, cache=not args.no_cache)

    dtype = jnp.dtype(args.dtype)
    plant_step = build_nonlinear_plant_step(jnp, sc)
    refs = np.zeros((T, 4))
    refs[:, 0] = sc.ref_value
    key = jax.random.PRNGKey(args.seed)
    kl, kw = jax.random.split(key)
    theta, gamma = draw_loss_masks(kl, T, args.loss_prob, args.loss_prob)
    w = draw_disturbances(kw, T, sc.w_lo, sc.w_hi)

    ok = True
    for name, setup, mode in [("tube", tube, "consistent"),
                              ("track", track, "smart")]:
        arrays, cfg = setup.to_device(dtype=dtype,
                                      **solver_kwargs(args))
        roll = jax.jit(make_rollout_fn(arrays, cfg, T, actuator_mode=mode,
                                       plant_step=plant_step))
        carry, outs = roll(jnp.asarray(sc.x0, dtype),
                           jnp.asarray(refs, dtype), w.astype(dtype),
                           theta, gamma)
        traj = np.vstack([sc.x0[None], np.asarray(outs.x)])
        ok &= check(f"{name} rollout finite", bool(np.isfinite(traj).all()))
        ok &= check(f"{name} pole angle bounded (|phi| < 0.3)",
                    bool(np.abs(traj[:, 2]).max() < 0.3),
                    f"max |phi| = {np.abs(traj[:, 2]).max():.3f}")
        frames = render_gif(traj, sc.Th,
                            f"{RESULTS_DIR}/animation_{name}_p"
                            f"{args.loss_prob:.1f}.gif",
                            f"{name} MPC, p={args.loss_prob}")
        if args.strip_dir:
            render_strip(frames,
                         f"{args.strip_dir}/animation_{name}_p"
                         f"{args.loss_prob:.1f}_strip.png")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
