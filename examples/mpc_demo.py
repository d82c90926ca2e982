"""Standalone MPC demo: track a drawn/generated path with the on-device QP.

Counterpart of the reference interactive demo (reference: src/MPC/MPC.py:
17-213 — matplotlib ginput track drawing + cvxpy receding-horizon playback):
here the path comes from --points, a generated track, or a built-in squiggle,
and the rollout is one jitted scan of ADMM solves. Writes an animation-style
strip plot of the tracked trajectory.

Usage: python examples/mpc_demo.py [--out /tmp/mpc_demo.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from red_gym_tpu.agents import mpc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/mpc_demo.png")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--velocity", type=float, default=2.0)
    args = ap.parse_args()

    # a built-in squiggly path (stand-in for the reference's ginput drawing)
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
    err = np.abs(traj[:, 1] - np.interp(traj[:, 0], path[:, 0], path[:, 1])).mean()
    print(f"wrote {args.out}; mean tracking error {err:.3f} m")


if __name__ == "__main__":
    main()
