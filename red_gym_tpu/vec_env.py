"""Stateful vectorized env wrapper: thousands of F110 envs, one object.

The reference scales by running one process per env (its docs' "massively
parallel applications" aspiration, reference docs/index.rst:12); the
functional core here scales with vmap (rollout.py).  This wrapper packages
that as the familiar VecEnv shape — reset/step with batched arrays,
auto-reset on done — for users porting from the reference gym API without
adopting the functional style.  All compute stays in one jitted program per
step; only the state handle lives on the Python side.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from red_gym_tpu.config import Integrator, SimConfig, VehicleParams
from red_gym_tpu import env as envlib


class VecF110Env:
    """Batched stateful env.

    obs/reward/done come back as batched jax arrays (convert with
    np.asarray if needed); crashed/finished envs auto-reset to their start
    pose within the same step, like standard VecEnv semantics (the info dict
    carries the pre-reset ``done`` flags).
    """

    def __init__(self, map: str | list[str], num_envs: int,
                 map_ext: str = ".png", num_agents: int = 2,
                 timestep: float = 0.01,
                 integrator: Integrator = Integrator.RK4,
                 seed: int = 12345, auto_reset: bool = True,
                 params: dict | VehicleParams | None = None,
                 map_idx=None, randomize_starts=None,
                 return_final_obs: bool = False, **cfg_kwargs):
        """``randomize_starts``: optional (M, A, 3) per-map start-pose table
        for domain randomization over a multi-map env (``map`` a list):
        every auto-reset draws a fresh track uniformly and spawns at that
        track's start pose (the rollout.make_rollout(randomize_starts=...)
        capability, surfaced on the wrapper).

        ``return_final_obs``: include the PRE-auto-reset observation of the
        step in ``info["final_obs"]`` (gymnasium same-step autoreset
        convention — value bootstrapping at episode ends needs the terminal
        obs, which auto-reset otherwise discards).  Off by default: it
        doubles the per-step obs HBM traffic."""
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        unknown = set(cfg_kwargs) - set(SimConfig.__dataclass_fields__)
        if unknown:
            raise TypeError(f"unknown SimConfig option(s): {sorted(unknown)}")
        self.cfg = SimConfig(num_agents=num_agents, timestep=timestep,
                             integrator=integrator, **cfg_kwargs)
        if isinstance(params, dict):
            vehicle = VehicleParams.from_dict(params, dtype=self.cfg.jdtype)
        elif isinstance(params, VehicleParams):
            vehicle = params
        else:
            vehicle = VehicleParams.default(self.cfg.jdtype)

        def _yaml(m):
            return m if m.endswith(".yaml") else f"{m}.yaml"

        if isinstance(map, (list, tuple)):
            self.params = envlib.make_multimap_params(
                self.cfg, [_yaml(m) for m in map], map_ext, vehicle=vehicle)
            if map_idx is None:
                map_idx = np.arange(num_envs) % len(map)
            self._map_idx = jnp.asarray(map_idx, jnp.int32)
        else:
            self.params = envlib.make_params(self.cfg, _yaml(map), map_ext,
                                             vehicle)
            self._map_idx = None
        if randomize_starts is not None:
            if self._map_idx is None:
                raise ValueError("randomize_starts needs a multi-map env "
                                 "(pass a list of maps)")
            randomize_starts = jnp.asarray(randomize_starts, self.cfg.jdtype)
            if randomize_starts.shape[0] != len(map):
                raise ValueError(
                    f"randomize_starts has {randomize_starts.shape[0]} rows "
                    f"for {len(map)} maps")
        self._randomize_starts = randomize_starts
        self._key = jax.random.PRNGKey(seed)
        self.states = None

        cfg = self.cfg
        has_mi = self._map_idx is not None

        def reset_one(pr, po, k, mi):
            return envlib.reset(cfg, pr, po, k,
                                map_idx=mi if has_mi else None)

        def step_one(pr, s, a):
            return envlib.step(cfg, pr, s, a)

        mi_ax = 0 if has_mi else None
        self._reset_v = jax.jit(jax.vmap(reset_one,
                                         in_axes=(None, 0, 0, mi_ax)))
        step_v = jax.vmap(step_one, in_axes=(None, 0, 0))

        def step_auto(pr, states, actions, key, rs):
            states, obs, reward, done, info = step_v(pr, states, actions)
            if return_final_obs:
                info = dict(info, final_obs=obs)
            if auto_reset:
                key, kr = jax.random.split(key)
                keys = jax.random.split(kr, done.shape[0])
                if rs is not None:
                    # domain randomization: fresh track + its start pose
                    new_m = jax.random.randint(
                        key, (done.shape[0],), 0, rs.shape[0])
                    r_states, r_obs, *_ = jax.vmap(
                        reset_one, in_axes=(None, 0, 0, 0))(
                            pr, rs[new_m], keys, new_m)
                else:
                    # restart in place: current per-env map + start pose
                    mi = states.map_idx if has_mi else None
                    r_states, r_obs, *_ = jax.vmap(
                        reset_one, in_axes=(None, 0, 0, mi_ax))(
                            pr, states.start_pose, keys, mi)
                sel = lambda a_, b_: jnp.where(
                    done.reshape((-1,) + (1,) * (a_.ndim - 1)), a_, b_)
                states = jax.tree.map(sel, r_states, states)
                obs = jax.tree.map(sel, r_obs, obs)
            return states, obs, reward, done, info

        self._step_v = jax.jit(step_auto)

    def reset(self, poses):
        """poses (E, A, 3) -> batched obs dict."""
        poses = jnp.asarray(poses, self.cfg.jdtype)
        if poses.ndim == 2:
            poses = jnp.broadcast_to(poses[None], (self.num_envs,) + poses.shape)
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_envs)
        self.states, obs, reward, done, info = self._reset_v(
            self.params, poses, keys, self._map_idx)
        return self._obs_dict(obs), reward, done, self._info(info, done)

    def step(self, actions):
        """actions (E, A, 2) -> (obs dict, rewards (E,), dones (E,), info)."""
        self._key, sub = jax.random.split(self._key)
        self.states, obs, reward, done, info = self._step_v(
            self.params, self.states, jnp.asarray(actions, self.cfg.jdtype),
            sub, self._randomize_starts)
        return self._obs_dict(obs), reward, done, self._info(info, done)

    @staticmethod
    def _obs_dict(obs) -> dict:
        d = {k: getattr(obs, k) for k in obs._fields}
        d["ego_idx"] = 0
        return d

    @staticmethod
    def _info(info, done) -> dict:
        out = {"checkpoint_done": info["checkpoint_done"], "done": done}
        if "final_obs" in info:
            out["final_obs"] = VecF110Env._obs_dict(info["final_obs"])
        return out
