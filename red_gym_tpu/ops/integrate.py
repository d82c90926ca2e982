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
