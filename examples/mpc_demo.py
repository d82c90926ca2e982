"""Standalone MPC demo: track a drawn/generated path with the on-device QP.

Counterpart of the reference interactive demo (reference: src/MPC/MPC.py:
17-213 — matplotlib ginput track drawing + cvxpy receding-horizon playback).
The path comes from --draw (interactive click-to-add-points canvas, Enter to
finish, matching the reference's draw_track flow at src/MPC/MPC.py:17-33),
--points, or a built-in squiggle; the rollout is one jitted scan of ADMM
solves instead of per-step cvxpy.  Output is a strip plot of the tracked
trajectory, plus an animated rectangle-car playback (--animate, the
counterpart of the reference's FuncAnimation at src/MPC/MPC.py:182-213 —
savable as GIF/MP4 so it also works headless).

Usage:
  python examples/mpc_demo.py                       # built-in path, png out
  python examples/mpc_demo.py --draw                # click a track, Enter
  python examples/mpc_demo.py --points x0,y0 x1,y1 ...
  python examples/mpc_demo.py --animate /tmp/mpc.gif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from red_gym_tpu.agents import mpc


def draw_track():
    """Interactive point-by-point track drawing (reference
    src/MPC/MPC.py:17-33): click to add points on a 40x40 canvas, press
    Enter to finish.  Requires a display; raises a clear error headless."""
    import matplotlib
    import matplotlib.pyplot as plt

    if matplotlib.get_backend().lower() == "agg" and not os.environ.get(
            "MPLBACKEND"):
        raise SystemExit(
            "--draw needs an interactive matplotlib backend (no display "
            "found); pass --points x,y ... or drop --draw instead")
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_title("Draw your racetrack.\n"
                 "Click to add points; press Enter when finished.")
    ax.set_xlim(0, 40)
    ax.set_ylim(0, 40)
    pts = plt.ginput(n=-1, timeout=0, show_clicks=True)
    plt.close(fig)
    if len(pts) < 2:
        raise SystemExit("need at least 2 clicked points")
    return np.asarray(pts, np.float32)


def animate_car(path, traj, out):
    """Rectangle-car playback along the MPC trajectory, heading from the
    velocity vector (reference src/MPC/MPC.py:176-213), saved to GIF/MP4."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation, transforms
    from matplotlib.patches import Rectangle

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_xlim(path[:, 0].min() - 5, path[:, 0].max() + 5)
    ax.set_ylim(path[:, 1].min() - 5, path[:, 1].max() + 5)
    ax.set_aspect("equal")
    ax.set_title("MPC following the drawn track")
    ax.plot(path[:, 0], path[:, 1], "r--", label="track")
    ax.plot(traj[:, 0], traj[:, 1], "g-", label="car trajectory")
    ax.legend()
    L, W = 1.0, 0.5
    car = Rectangle((-L / 2, -W / 2), L, W, fc="tab:blue", ec="black")
    ax.add_patch(car)
    vel = np.gradient(traj, axis=0)

    def frame(i):
        th = (np.arctan2(vel[i, 1], vel[i, 0])
              if np.hypot(*vel[i]) > 1e-3 else 0.0)
        car.set_transform(transforms.Affine2D().rotate(th)
                          .translate(traj[i, 0], traj[i, 1]) + ax.transData)
        return (car,)

    ani = animation.FuncAnimation(fig, frame, frames=len(traj), blit=True,
                                  interval=100)
    writer = ("pillow" if out.endswith(".gif") else "ffmpeg")
    ani.save(out, writer=writer, fps=10)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/mpc_demo.png")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--velocity", type=float, default=2.0)
    ap.add_argument("--draw", action="store_true",
                    help="draw the track interactively (click points, Enter)")
    ap.add_argument("--points", type=str, nargs="*",
                    help="track waypoints as x,y pairs")
    ap.add_argument("--animate", type=str, default=None,
                    help="also write an animated car playback (gif/mp4)")
    args = ap.parse_args()

    if args.draw:
        path = draw_track()
    elif args.points:
        path = np.asarray([[float(v) for v in p.split(",")]
                           for p in args.points], np.float32)
    else:
        # a built-in squiggly path (stand-in for drawing)
        t = np.linspace(0, 3 * np.pi, 24)
        path = np.stack([t, 1.5 * np.sin(t)], axis=1).astype(np.float32)

    cfg = mpc.default_mpc_config(jnp.float32)
    u_hist = np.asarray(mpc.mpc_controller(
        jnp.asarray(path), jnp.float32(args.velocity), cfg.timestep,
        cfg.Q, cfg.R, cfg.Qf, total_steps=args.steps, horizon=cfg.horizon))

    # replay the double integrator under the control history
    dt = float(cfg.timestep)
    A = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]])
    B = np.array([[0.5 * dt**2, 0], [0, 0.5 * dt**2], [dt, 0], [0, dt]])
    x = np.array([path[0, 0], path[0, 1], 0.0, 0.0])
    traj = [x[:2].copy()]
    for u in u_hist:
        x = A @ x + B @ u
        traj.append(x[:2].copy())
    traj = np.array(traj)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 4))
    plt.plot(path[:, 0], path[:, 1], "k--", label="reference path")
    plt.plot(traj[:, 0], traj[:, 1], "r-", label="MPC trajectory")
    plt.scatter(traj[::10, 0], traj[::10, 1], c="r", s=12)
    plt.legend()
    plt.title(f"on-device ADMM MPC, horizon {cfg.horizon}, |u|<=1")
    plt.savefig(args.out, dpi=120)
    # nearest-waypoint distance (valid for drawn loops, unlike x-interp)
    err = np.linalg.norm(traj[:, None, :] - path[None, :, :],
                         axis=-1).min(axis=1).mean()
    print(f"wrote {args.out}; mean nearest-waypoint error {err:.3f} m")
    if args.animate:
        animate_car(path, traj, args.animate)
        print(f"wrote {args.animate}")


if __name__ == "__main__":
    main()
