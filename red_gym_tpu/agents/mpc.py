"""On-device MPC: double-integrator path tracking as a jitted box-QP.

The reference MPC (reference: src/SAL.py:615-739 and src/MPC/MPC.py) builds a
cvxpy problem and calls OSQP on the host for every control step — the hot
inner loop of the SAC training stack.  The problem is tiny and fixed-shape
(horizon 5, 2D double integrator, |u| <= 1 box), which makes it ideal for an
on-device solver: here the QP is condensed into the control variables and
solved by ADMM with a fixed iteration count — one jitted program per control
step, vmappable across thousands of envs.

The not-a-knot cubic spline reference trajectory matches scipy's
CubicSpline (the reference's interpolator, SAL.py:643-644) to fp precision.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Natural ("not-a-knot") cubic spline, matching scipy.interpolate.CubicSpline
# ---------------------------------------------------------------------------


def spline_moments(xs, ys):
    """Second derivatives (moments) of the not-a-knot cubic spline.

    xs (N,) strictly increasing, ys (N,) -> M (N,).
    """
    n = xs.shape[0]
    h = xs[1:] - xs[:-1]                       # (N-1,)
    a = jnp.zeros((n, n), dtype=ys.dtype)
    b = jnp.zeros((n,), dtype=ys.dtype)
    # interior moment equations
    i = jnp.arange(1, n - 1)
    a = a.at[i, i - 1].set(h[:-1] / 6.0)
    a = a.at[i, i].set((h[:-1] + h[1:]) / 3.0)
    a = a.at[i, i + 1].set(h[1:] / 6.0)
    b = b.at[i].set((ys[2:] - ys[1:-1]) / h[1:] - (ys[1:-1] - ys[:-2]) / h[:-1])
    # not-a-knot: third derivative continuous at x1 and x_{n-2}
    a = a.at[0, 0].set(h[1])
    a = a.at[0, 1].set(-(h[0] + h[1]))
    a = a.at[0, 2].set(h[0])
    a = a.at[n - 1, n - 3].set(h[-1])
    a = a.at[n - 1, n - 2].set(-(h[-2] + h[-1]))
    a = a.at[n - 1, n - 1].set(h[-2])
    return jnp.linalg.solve(a, b)


class Spline(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    m: jnp.ndarray  # moments


def spline_fit(xs, ys) -> Spline:
    return Spline(xs, ys, spline_moments(xs, ys))


def spline_eval(sp: Spline, x):
    """Value and first derivative at x (scalar or array), with the standard
    moment-form piecewise cubic."""
    xs, ys, m = sp
    i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, xs.shape[0] - 2)
    h = xs[i + 1] - xs[i]
    t0 = x - xs[i]
    t1 = xs[i + 1] - x
    y = (m[i] * t1**3 + m[i + 1] * t0**3) / (6 * h) \
        + (ys[i] / h - m[i] * h / 6) * t1 + (ys[i + 1] / h - m[i + 1] * h / 6) * t0
    dy = (-m[i] * t1**2 + m[i + 1] * t0**2) / (2 * h) \
        - (ys[i] / h - m[i] * h / 6) + (ys[i + 1] / h - m[i + 1] * h / 6)
    return y, dy


# ---------------------------------------------------------------------------
# Condensed box-QP via ADMM
# ---------------------------------------------------------------------------


def _condense(A, B, Q, R, Qf, horizon):
    """Stack the dynamics: x = Phi x0 + Gamma u_flat; return (H, Phi, Gamma,
    Qbar) for the condensed quadratic 0.5 u'Hu + (x0, ref)-dependent linear
    term computed at solve time."""
    nx, nu = B.shape
    Phi = jnp.concatenate([jnp.linalg.matrix_power(A, k + 1)
                           for k in range(horizon)], axis=0)          # (H*nx, nx)
    blocks = []
    for r in range(horizon):
        row = []
        for c in range(horizon):
            if c <= r:
                row.append(jnp.linalg.matrix_power(A, r - c) @ B)
            else:
                row.append(jnp.zeros((nx, nu), dtype=B.dtype))
        blocks.append(jnp.concatenate(row, axis=1))
    Gamma = jnp.concatenate(blocks, axis=0)                           # (H*nx, H*nu)

    qdiag = [Q] * (horizon - 1) + [Qf]
    Qbar = jax.scipy.linalg.block_diag(*qdiag)                        # (H*nx, H*nx)
    Rbar = jax.scipy.linalg.block_diag(*([R] * horizon))
    Hmat = Gamma.T @ Qbar @ Gamma + Rbar
    return Hmat, Phi, Gamma, Qbar


def admm_box_qp(Hmat, g, lo, hi, rho: float = 1.0, iters: int = 60):
    """min 0.5 u'Hu + g'u  s.t. lo <= u <= hi, via scaled ADMM with a
    precomputed Cholesky factor.  Fixed iteration count keeps it jittable."""
    n = g.shape[0]
    dt = Hmat.dtype
    L = jnp.linalg.cholesky(Hmat + rho * jnp.eye(n, dtype=dt))

    def body(carry, _):
        z, lam = carry
        rhs = -g.astype(dt) + rho * (z - lam)
        u = jax.scipy.linalg.cho_solve((L, True), rhs)
        z = jnp.clip(u + lam, lo, hi)
        lam = lam + u - z
        return (z, lam), None

    (z, _), _ = jax.lax.scan(body, (jnp.zeros(n, dt), jnp.zeros(n, dt)),
                             None, length=iters)
    return z


class MPCConfig(NamedTuple):
    desired_velocity: jnp.ndarray
    timestep: jnp.ndarray
    total_steps: int
    horizon: int
    Q: jnp.ndarray
    R: jnp.ndarray
    Qf: jnp.ndarray


def default_mpc_config(dtype=jnp.float32) -> MPCConfig:
    """The SAL MPC parameters (SAL.py:37-45)."""
    return MPCConfig(
        desired_velocity=jnp.asarray(2.0, dtype),
        timestep=jnp.asarray(0.1, dtype),
        total_steps=10,
        horizon=5,
        Q=jnp.diag(jnp.asarray([1.0, 1.0, 0.1, 0.1], dtype)),
        R=jnp.diag(jnp.asarray([0.1, 0.1], dtype)),
        Qf=jnp.diag(jnp.asarray([10.0, 10.0, 1.0, 1.0], dtype)),
    )


@partial(jax.jit, static_argnames=("total_steps", "horizon", "admm_iters"))
def mpc_controller(path, desired_velocity, timestep, Q, R, Qf,
                   total_steps: int = 10, horizon: int = 5,
                   current_vel_x=0.0, current_vel_y=0.0, admm_iters: int = 60):
    """Control sequence along a path (reference MPC_controller,
    SAL.py:615-739).

    path (K, 2) -> u_history (total_steps, 2): receding-horizon solutions of
    the condensed box-QP, rolling the double-integrator state forward with
    the first control of each solve.
    """
    dt = timestep
    dtype = path.dtype

    # arc-length parametrization + not-a-knot splines (SAL.py:632-644)
    seglen = jnp.linalg.norm(path[1:] - path[:-1], axis=1)
    dists = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(seglen)])
    sp_x = spline_fit(dists, path[:, 0])
    sp_y = spline_fit(dists, path[:, 1])

    # reference trajectory at constant arc speed (SAL.py:660-686)
    n_ref = total_steps + horizon + 1
    t_grid = jnp.arange(n_ref, dtype=dtype) * dt
    s = jnp.minimum(desired_velocity * t_grid, dists[-1])
    x_ref, vx_ref = spline_eval(sp_x, s)
    y_ref, vy_ref = spline_eval(sp_y, s)
    speed = jnp.hypot(vx_ref, vy_ref)
    scale = jnp.where(speed > 1e-3, desired_velocity / speed, 0.0)
    ref = jnp.stack([x_ref, y_ref, vx_ref * scale, vy_ref * scale], axis=1)

    A = jnp.array([[1, 0, dt, 0], [0, 1, 0, dt],
                   [0, 0, 1, 0], [0, 0, 0, 1]], dtype)
    B = jnp.array([[0.5 * dt**2, 0], [0, 0.5 * dt**2],
                   [dt, 0], [0, dt]], dtype)
    Hmat, Phi, Gamma, Qbar = _condense(A, B, Q, R, Qf, horizon)
    lo = -jnp.ones((horizon * 2,), dtype)
    hi = jnp.ones((horizon * 2,), dtype)

    x0 = jnp.array([path[0, 0], path[0, 1], current_vel_x, current_vel_y], dtype)

    def solve_step(x_cur, t):
        ref_h = jax.lax.dynamic_slice_in_dim(ref, t + 1, horizon)     # (H, 4)
        r_flat = ref_h.reshape(-1)
        g = Gamma.T @ Qbar @ (Phi @ x_cur - r_flat)
        u_flat = admm_box_qp(Hmat, g, lo, hi, iters=admm_iters)
        u0 = u_flat[:2]
        x_next = A @ x_cur + B @ u0
        return x_next, u0

    _, u_hist = jax.lax.scan(solve_step, x0, jnp.arange(total_steps))
    return u_hist


def mpc_converter(x_accel, y_accel, current_speed, current_steer,
                  max_steer, max_accel, max_velo, min_velo):
    """(ax, ay) -> [steering, throttle] (reference MPC_converter,
    SAL.py:741-764)."""
    target_angle = jnp.arctan2(y_accel, x_accel)
    angle_diff = jnp.mod(target_angle - current_steer + jnp.pi, 2 * jnp.pi) - jnp.pi
    steering = jnp.clip(angle_diff, -max_steer, max_steer)
    forward = x_accel * jnp.cos(current_steer) + y_accel * jnp.sin(current_steer)
    throttle = jnp.clip(forward, -1.0, 1.0)
    return jnp.stack([steering, throttle])
