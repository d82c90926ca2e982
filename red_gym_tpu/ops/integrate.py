"""Fixed-step time integrators for the vehicle ODE.

The reference inlines an RK4 loop and an Euler step inside
``RaceCar.update_pose`` (reference: base_classes.py:282-393).  Here they are
standalone combinators over an arbitrary RHS so the same code integrates a
single car or a (env, agent)-batched fleet — the four RK stages are unrolled
straight-line jnp, which XLA fuses into one kernel.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from red_gym_tpu.config import Integrator


def rk4_step(rhs: Callable, x, u, dt, p):
    """Classic RK4 with the reference's exact stage arithmetic
    (base_classes.py:282-371): stage states ``x + dt*(k/2)`` and the
    ``dt*(1/6)*(k1 + 2k2 + 2k3 + k4)`` update, preserving fp ordering for
    bit-parity."""
    k1 = rhs(x, u, p)
    k2 = rhs(x + dt * (k1 / 2), u, p)
    k3 = rhs(x + dt * (k2 / 2), u, p)
    k4 = rhs(x + dt * k3, u, p)
    return x + dt * (1.0 / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def euler_step(rhs: Callable, x, u, dt, p):
    """Explicit Euler (base_classes.py:373-393)."""
    return x + dt * rhs(x, u, p)


def integrate(integrator: Integrator, rhs: Callable, x, u, dt, p):
    if integrator is Integrator.RK4:
        return rk4_step(rhs, x, u, dt, p)
    if integrator is Integrator.EULER:
        return euler_step(rhs, x, u, dt, p)
    raise ValueError(f"unknown integrator {integrator}")


def _taxpy(x, a, k):
    """Per-component x + a*k over state tuples."""
    return tuple(xi + a * ki for xi, ki in zip(x, k))


def rk4_step_t(rhs_t: Callable, xt, sv, ac, dt, p):
    """RK4 on component tuples — same arithmetic and fp ordering as
    rk4_step, but with no stack/slice per stage so the whole step fuses."""
    k1 = rhs_t(xt, sv, ac, p)
    k2 = rhs_t(_taxpy(xt, dt / 2, k1), sv, ac, p)
    k3 = rhs_t(_taxpy(xt, dt / 2, k2), sv, ac, p)
    k4 = rhs_t(_taxpy(xt, dt, k3), sv, ac, p)
    c = dt * (1.0 / 6.0)
    return tuple(x + c * (a + 2.0 * b + 2.0 * cc + d)
                 for x, a, b, cc, d in zip(xt, k1, k2, k3, k4))


def euler_step_t(rhs_t: Callable, xt, sv, ac, dt, p):
    return _taxpy(xt, dt, rhs_t(xt, sv, ac, p))


def integrate_t(integrator: Integrator, rhs_t: Callable, xt, sv, ac, dt, p):
    """Tuple-form integrate: xt is a tuple of state components, (sv, ac)
    the control components; returns the advanced tuple."""
    if integrator is Integrator.RK4:
        return rk4_step_t(rhs_t, xt, sv, ac, dt, p)
    if integrator is Integrator.EULER:
        return euler_step_t(rhs_t, xt, sv, ac, dt, p)
    raise ValueError(f"unknown integrator {integrator}")


def wrap_yaw(yaw):
    """Single-step yaw wrap into [0, 2*pi).

    The reference applies at most ONE correction per step
    (base_classes.py:399-402) rather than a modulo; replicated exactly so
    trajectories stay bit-comparable.
    """
    two_pi = 2.0 * jnp.pi
    yaw = jnp.where(yaw > two_pi, yaw - two_pi, yaw)
    yaw = jnp.where(yaw < 0.0, yaw + two_pi, yaw)
    return yaw
