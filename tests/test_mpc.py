"""MPC tests: spline parity vs scipy, QP optimality vs an L-BFGS-B oracle,
and closed-loop equivalence with a numpy re-statement of the reference
problem (src/SAL.py:615-764; cvxpy/OSQP is not installed, so the oracle is
scipy's bounded quasi-Newton on the identical convex objective)."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.interpolate import CubicSpline
from scipy.optimize import minimize

from red_gym_tpu.agents import mpc


@pytest.mark.slow
def test_spline_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(4, 20))
        xs = np.sort(rng.uniform(0, 10, n))
        xs += np.arange(n) * 1e-3  # ensure strictly increasing
        ys = rng.normal(size=n)
        cs = CubicSpline(xs, ys)  # default not-a-knot, like the reference
        sp = mpc.spline_fit(jnp.asarray(xs), jnp.asarray(ys))
        xq = np.linspace(xs[0], xs[-1], 50)
        y, dy = mpc.spline_eval(sp, jnp.asarray(xq))
        np.testing.assert_allclose(np.asarray(y), cs(xq), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dy), cs.derivative()(xq), atol=1e-8)


def _reference_qp_numpy(path, v_des, dt, total_steps, horizon, Q, R, Qf,
                        v0=(0.0, 0.0)):
    """Numpy re-statement of the reference's receding-horizon loop
    (SAL.py:646-739), with each horizon QP solved by L-BFGS-B."""
    dists = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(path, axis=0), axis=1))])
    cs_x, cs_y = CubicSpline(dists, path[:, 0]), CubicSpline(dists, path[:, 1])
    n_ref = total_steps + horizon + 1
    ref = np.zeros((n_ref, 4))
    for i in range(n_ref):
        s = min(v_des * i * dt, dists[-1])
        vx, vy = cs_x.derivative()(s), cs_y.derivative()(s)
        sp = np.hypot(vx, vy)
        if sp > 1e-3:
            vx, vy = v_des * vx / sp, v_des * vy / sp
        else:
            vx = vy = 0.0
        ref[i] = [cs_x(s), cs_y(s), vx, vy]

    A = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]])
    B = np.array([[0.5 * dt**2, 0], [0, 0.5 * dt**2], [dt, 0], [0, dt]])

    x_cur = np.array([path[0, 0], path[0, 1], *v0])
    u_hist = []
    for t in range(total_steps):
        def cost(uf):
            u = uf.reshape(horizon, 2)
            x = x_cur.copy()
            c = 0.0
            for k in range(horizon):
                x = A @ x + B @ u[k]
                W = Qf if k == horizon - 1 else Q
                e = x - ref[t + k + 1]
                c += e @ W @ e + u[k] @ R @ u[k]
            return c

        res = minimize(cost, np.zeros(horizon * 2), method="L-BFGS-B",
                       bounds=[(-1, 1)] * (horizon * 2),
                       options={"ftol": 1e-14, "gtol": 1e-12, "maxiter": 500})
        u0 = res.x[:2]
        u_hist.append(u0)
        x_cur = A @ x_cur + B @ u0
    return np.array(u_hist)


def test_controller_matches_oracle():
    rng = np.random.default_rng(1)
    cfg = mpc.default_mpc_config(jnp.float64)
    for trial in range(3):
        # a smooth-ish random forward path like the SAC path decoder makes
        angles = np.cumsum(rng.uniform(-0.17, 0.17, 16))
        steps = 0.5 * np.stack([np.cos(angles), np.sin(angles)], axis=1)
        path = np.concatenate([[[0.0, 0.0]], np.cumsum(steps, axis=0)])

        want = _reference_qp_numpy(path, 2.0, 0.1, 10, 5,
                                   np.asarray(cfg.Q), np.asarray(cfg.R),
                                   np.asarray(cfg.Qf))
        got = np.asarray(mpc.mpc_controller(
            jnp.asarray(path), jnp.float64(2.0), jnp.float64(0.1),
            cfg.Q.astype(jnp.float64), cfg.R.astype(jnp.float64),
            cfg.Qf.astype(jnp.float64), total_steps=10, horizon=5,
            admm_iters=200))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_converter_matches_reference():
    rng = np.random.default_rng(2)
    for _ in range(100):
        ax, ay = rng.uniform(-1, 1, 2)
        cs, cst = rng.uniform(0, 8), rng.uniform(-0.4, 0.4)
        got = np.asarray(mpc.mpc_converter(ax, ay, cs, cst, 0.4189, 3.0, 8.0, -4.0))
        # reference formulas (SAL.py:756-762)
        ta = np.arctan2(ay, ax)
        ad = (ta - cst + np.pi) % (2 * np.pi) - np.pi
        want_st = np.clip(ad, -0.4189, 0.4189)
        want_th = np.clip(ax * np.cos(cst) + ay * np.sin(cst), -1, 1)
        np.testing.assert_allclose(got, [want_st, want_th], atol=1e-6)


def test_controller_tracks_straight_line():
    """Sanity: on a straight path the controller accelerates forward with
    negligible lateral input."""
    cfg = mpc.default_mpc_config(jnp.float64)
    path = np.stack([np.linspace(0, 5, 16), np.zeros(16)], axis=1)
    u = np.asarray(mpc.mpc_controller(
        jnp.asarray(path), jnp.float64(2.0), jnp.float64(0.1),
        cfg.Q.astype(jnp.float64), cfg.R.astype(jnp.float64),
        cfg.Qf.astype(jnp.float64)))
    assert u[0, 0] > 0.5            # accelerate along +x
    assert np.all(np.abs(u[:, 1]) < 1e-6)
    assert np.all(np.abs(u) <= 1.0 + 1e-9)
