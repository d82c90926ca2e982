"""Batched rollout drivers: vmap over envs, lax.scan over time, auto-reset.

This is the capability the reference only aspired to ("enable massively
parallel applications", reference docs/index.rst:12 — one env object per
process): here an arbitrary env axis is added with `vmap`, episodes stream
through `lax.scan` with auto-reset-on-done, and the same code shards over
device meshes (see red_gym_tpu/parallel/sharding.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.env import EnvParams, EnvState, Observation, reset, step


def batched_reset(cfg: SimConfig, params: EnvParams, poses, keys,
                  map_axis: Optional[int] = None, map_idx=None):
    """Reset E envs at poses (E, A, 3) with keys (E,).

    ``map_axis=0`` means params.tmap carries a leading env axis (different
    track per env).  ``map_idx`` (E,) int32 instead assigns each env a map
    from a map-STACKED params (copy-free; see env.make_multimap_params).
    Jitted — eager vmap would dispatch per-op.
    """
    p_axes = _params_axes(map_axis, params.rtex is not None)
    if map_idx is None:
        f = jax.jit(jax.vmap(lambda p, po, k: reset(cfg, p, po, k),
                             in_axes=(p_axes, 0, 0)))
        return f(params, poses, keys)
    f = jax.jit(jax.vmap(lambda p, po, k, m: reset(cfg, p, po, k, map_idx=m),
                         in_axes=(p_axes, 0, 0, 0)))
    return f(params, poses, keys, jnp.asarray(map_idx, jnp.int32))


def _params_axes(map_axis, has_rtex: bool = False):
    if map_axis is None:
        return None
    # vmap only the map leaves (and, in fast mode, the per-map range
    # texture); vehicle params and tables are shared
    from red_gym_tpu.maps.loader import TrackMap
    from red_gym_tpu.ops import scan_fast

    return EnvParams(vehicle=None, tables=None,
                     tmap=TrackMap(*([map_axis] * len(TrackMap._fields))),
                     rtex=scan_fast.batch_axes(map_axis) if has_rtex else None)


def batched_step(cfg: SimConfig, params: EnvParams, states, actions,
                 map_axis: Optional[int] = None):
    """Step E envs: states batched (E, ...), actions (E, A, 2)."""
    in_axes = (_params_axes(map_axis, params.rtex is not None), 0, 0)
    f = jax.jit(jax.vmap(lambda p, s, a: step(cfg, p, s, a), in_axes=in_axes))
    return f(params, states, actions)


class RolloutCarry(NamedTuple):
    state: EnvState      # batched (E, ...)
    obs: Observation     # batched
    key: jax.Array       # driver key for resets


def make_rollout(cfg: SimConfig, params: EnvParams,
                 policy: Callable[[Observation, jax.Array], jnp.ndarray],
                 steps: int, map_axis: Optional[int] = None,
                 auto_reset: bool = True, collect: bool = False,
                 randomize_starts=None):
    """Build a jittable rollout fn over batched envs.

    ``policy(obs, key) -> actions (E, A, 2)`` is any pure function — a
    scripted controller, a flax policy apply, or random actions.  On done,
    the env restarts from its start_pose with a fresh noise key (the batched
    analogue of the reference's reset-on-done driver loops).

    ``randomize_starts``: optional (M, A, 3) start-pose table for domain
    randomization over a map-STACKED params (EnvState.map_idx envs): every
    auto-reset draws a fresh track uniformly and spawns at that track's
    start pose.
    """
    p_axes = _params_axes(map_axis, params.rtex is not None)
    reset_v = jax.vmap(lambda p, po, k: reset(cfg, p, po, k), in_axes=(p_axes, 0, 0))
    reset_vm = jax.vmap(lambda p, po, k, m: reset(cfg, p, po, k, map_idx=m),
                        in_axes=(p_axes, 0, 0, 0))
    step_v = jax.vmap(lambda p, s, a: step(cfg, p, s, a), in_axes=(p_axes, 0, 0))
    if randomize_starts is not None:
        randomize_starts = jnp.asarray(randomize_starts, cfg.jdtype)

    def body(carry: RolloutCarry, _):
        key, akey, rkey = jax.random.split(carry.key, 3)
        actions = policy(carry.obs, akey)
        state, obs, reward, done, info = step_v(params, carry.state, actions)

        if auto_reset:
            n_env = done.shape[0]
            rkeys = jax.random.split(rkey, n_env)
            if randomize_starts is not None:
                assert state.map_idx is not None, \
                    "randomize_starts needs map_idx envs (make_multimap_params)"
                key, kmap = jax.random.split(key)
                new_m = jax.random.randint(
                    kmap, (n_env,), 0, randomize_starts.shape[0])
                r_state, r_obs, *_ = reset_vm(params, randomize_starts[new_m],
                                              rkeys, new_m)
            elif state.map_idx is None:
                r_state, r_obs, *_ = reset_v(params, state.start_pose, rkeys)
            else:
                r_state, r_obs, *_ = reset_vm(params, state.start_pose, rkeys,
                                              state.map_idx)
            sel = lambda a, b: jnp.where(
                done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
            state = jax.tree.map(sel, r_state, state)
            obs = jax.tree.map(sel, r_obs, obs)

        out = (obs, reward, done) if collect else (reward, done)
        return RolloutCarry(state, obs, key), out

    @jax.jit
    def run(carry: RolloutCarry):
        return jax.lax.scan(body, carry, None, length=steps)

    return run


def random_policy(cfg: SimConfig, steer_scale: float = 0.4, speed_lo: float = 1.0,
                  speed_hi: float = 8.0):
    """Uniform random actions (the reference dataset collector's driving
    policy, f1tenth_gym/examples/lidar.py)."""

    def policy(obs: Observation, key):
        n_agents = obs.scans.shape[-2]
        k1, k2 = jax.random.split(key)
        steer = steer_scale * jax.random.uniform(
            k1, (obs.scans.shape[0], n_agents), obs.scans.dtype, -1.0, 1.0)
        speed = jax.random.uniform(
            k2, (obs.scans.shape[0], n_agents), obs.scans.dtype, speed_lo, speed_hi)
        return jnp.stack([steer, speed], axis=-1)

    return policy
