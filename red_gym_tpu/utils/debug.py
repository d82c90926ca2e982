"""Simulation-state sanitizers and debug helpers.

The reference has no runtime diagnostics; its closest hazard was global
mutable scan state shared across envs (reference: base_classes.py:62-66),
eliminated here by design.  What remains worth guarding in long batched
runs: numerical blow-ups (NaN/Inf from extreme params or dt), states
escaping the map, and constraint violations.  ``check_state`` is
jit-friendly (returns violation counts, no host sync); ``explain`` turns
its report into human-readable findings on host.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.env import EnvParams, EnvState


def check_state(cfg: SimConfig, params: EnvParams, state: EnvState
                ) -> Dict[str, jnp.ndarray]:
    """Violation counts over a (batched) EnvState — pure, jittable,
    vmappable; all entries are integer counts (0 == healthy).

    With a map-STACKED params (multi-map), per-env map extents are selected
    through state.map_idx."""
    x = state.x
    p = params.vehicle
    nonfinite = jnp.sum(~jnp.isfinite(x))

    # pose inside the map rectangle (world frame, per true map extents)
    t = params.tmap
    if t.dt.ndim == 3:
        from red_gym_tpu.maps.loader import TrackMap

        if state.map_idx is not None:
            # map-STACKED params: select per-env scalars by map index
            sel = lambda leaf: leaf[state.map_idx][..., None]
        else:
            # per-env map axis (rollout map_axis=0): TrackMap leaves already
            # carry a leading env axis aligned with the state batch; just
            # add the agent broadcast dim
            sel = lambda leaf: leaf[..., None]
        t = TrackMap(dt=t.dt, occupancy=t.occupancy,
                     orig_x=sel(t.orig_x), orig_y=sel(t.orig_y),
                     orig_c=sel(t.orig_c), orig_s=sel(t.orig_s),
                     resolution=sel(t.resolution),
                     height=sel(t.height), width=sel(t.width))
    xt = x[..., 0] - t.orig_x
    yt = x[..., 1] - t.orig_y
    xr = xt * t.orig_c + yt * t.orig_s
    yr = -xt * t.orig_s + yt * t.orig_c
    w_m = t.width.astype(xr.dtype) * t.resolution
    h_m = t.height.astype(yr.dtype) * t.resolution
    off_map = jnp.sum((xr < 0) | (xr > w_m) | (yr < 0) | (yr > h_m))

    eps = jnp.asarray(1e-4, x.dtype)
    over_speed = jnp.sum((x[..., 3] > p.v_max + eps)
                         | (x[..., 3] < p.v_min - eps))
    over_steer = jnp.sum((x[..., 2] > p.s_max + eps)
                         | (x[..., 2] < p.s_min - eps))
    bad_yaw = jnp.sum((x[..., 4] < -2 * jnp.pi) | (x[..., 4] > 4 * jnp.pi))
    bad_clock = jnp.sum(state.current_time < 0) + jnp.sum(state.lap_times < 0)
    return {"nonfinite": nonfinite, "off_map": off_map,
            "over_speed": over_speed, "over_steer": over_steer,
            "bad_yaw": bad_yaw, "bad_clock": bad_clock}


def explain(report: Dict[str, jnp.ndarray]) -> list[str]:
    """Host-side: the nonzero findings of a check_state report."""
    return [f"{k}: {int(v)} violations" for k, v in report.items()
            if int(np.asarray(v)) > 0]


def env_health_mask(state: EnvState, max_abs_x: float = 1e4) -> jnp.ndarray:
    """Per-env boolean health over a batched EnvState (E, ...): an env is
    unhealthy iff any of its state leaves carries a non-finite value, OR
    its dynamic state ``x`` exceeds ``max_abs_x`` in magnitude — the stiff
    ST yaw/slip feedback passes through a huge-but-finite stage (observed
    |yaw_rate| ~1e35) for several steps before the first actual NaN, and
    consumers (rewards, observations) are already poisoned there.  The
    bound only applies to ``x`` (speeds/angles/rates, physically <= 1e2):
    clocks and lap times legitimately grow without bound in sustained
    runs.  Pure/jittable — the building block for quarantine_reset."""
    def bad(leaf):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return None
        axes = tuple(range(1, leaf.ndim))
        return jnp.any(~jnp.isfinite(leaf), axis=axes) if leaf.ndim else None

    flags = [b for b in map(bad, jax.tree.leaves(state)) if b is not None
             and b.ndim == 1]
    bad_any = flags[0]
    for f in flags[1:]:
        bad_any = bad_any | f
    axes = tuple(range(1, state.x.ndim))
    bad_any = bad_any | jnp.any(jnp.abs(state.x) > max_abs_x, axis=axes)
    return ~bad_any


def quarantine_reset(cfg: SimConfig, params: EnvParams, state: EnvState,
                     obs, key, map_axis=None):
    """Failure recovery for long batched runs: every env whose state has
    gone non-finite (hardware fault, extreme-parameter blow-up, injected
    corruption) is restarted from its start pose in place; healthy envs are
    untouched.  Pure and jittable — drop it into a rollout loop at whatever
    cadence the failure model warrants.

    The reference's only failure concept is collision->done
    (f110_env.py:242); this is the batched-RL generalization the SURVEY §5
    gap analysis calls for.  Returns (state', obs', healthy_mask).
    """
    from red_gym_tpu.env import reset
    from red_gym_tpu.rollout import _params_axes

    healthy = env_health_mask(state)
    n_env = healthy.shape[0]
    keys = jax.random.split(key, n_env)
    p_axes = _params_axes(map_axis, params.rtex is not None)
    # a NaN-poisoned start_pose would re-poison the reset: fall back to the
    # origin-pose zero state for those (still flagged via the mask)
    safe_pose = jnp.where(jnp.isfinite(state.start_pose),
                          state.start_pose, 0.0)
    if state.map_idx is None:
        r_state, r_obs, *_ = jax.vmap(
            lambda p, po, k: reset(cfg, p, po, k),
            in_axes=(p_axes, 0, 0))(params, safe_pose, keys)
    else:
        r_state, r_obs, *_ = jax.vmap(
            lambda p, po, k, m: reset(cfg, p, po, k, map_idx=m),
            in_axes=(p_axes, 0, 0, 0))(params, safe_pose, keys,
                                       state.map_idx)
    sel = lambda a, b: jnp.where(
        healthy.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
    state = jax.tree.map(sel, state, r_state)
    obs = jax.tree.map(sel, obs, r_obs)
    return state, obs, healthy


def assert_healthy(cfg: SimConfig, params: EnvParams, state: EnvState):
    """Host-side hard assert (forces a sync; use at episode boundaries,
    not in the hot loop)."""
    findings = explain(jax.jit(check_state, static_argnums=0)(
        cfg, params, state))
    if findings:
        raise AssertionError("unhealthy sim state: " + "; ".join(findings))
