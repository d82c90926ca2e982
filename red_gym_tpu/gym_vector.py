"""Gymnasium ``VectorEnv`` adapter over the on-device env batch.

The reference's "massively parallel applications" story is one process per
env (reference docs/index.rst:12); here the batch lives on one chip as a
single jitted program (:class:`red_gym_tpu.vec_env.VecF110Env`), and this
module exposes it through the standard ``gymnasium.vector.VectorEnv``
interface so vector-API tooling (CleanRL-style loops, vector wrappers)
drives thousands of on-device cars unchanged:

    import gymnasium
    import red_gym_tpu                        # registers f110-v0
    envs = gymnasium.make_vec("f110-v0", num_envs=1024,
                              map="...", map_ext=".png")
    obs, info = envs.reset()
    obs, rew, term, trunc, info = envs.step(actions)   # (E, A, 2) numpy

Autoreset follows the SAME_STEP convention: a terminated env returns its
fresh reset observation in the same step, with the terminal observation in
``info["final_obs"]`` (stacked arrays) masked by ``info["_final_obs"]``.

Like every stateful wrapper here, the numpy boundary syncs device->host per
step (docs/performance.md "wrapper perf trap"); throughput training should
use :mod:`red_gym_tpu.rollout` or :class:`~red_gym_tpu.vec_env.VecF110Env`
directly, which keep observations on device.
"""

from __future__ import annotations

import numpy as np

import gymnasium
from gymnasium import spaces
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space

from red_gym_tpu.vec_env import VecF110Env

# reference start pose on the example map (examples/config_example_map.yaml)
_DEFAULT_POSE = (0.7, 0.0, 1.37079632679)


def _single_obs_space(a: int, b: int) -> spaces.Dict:
    inf = np.inf
    return spaces.Dict({
        # gaussian beam noise is added after the max-range clamp
        # (reference laser_models.py:450-452), so scans are unbounded
        "scans": spaces.Box(-inf, inf, (a, b), np.float32),
        "poses_x": spaces.Box(-inf, inf, (a,), np.float32),
        "poses_y": spaces.Box(-inf, inf, (a,), np.float32),
        "poses_theta": spaces.Box(-inf, inf, (a,), np.float32),
        "linear_vels_x": spaces.Box(-inf, inf, (a,), np.float32),
        "linear_vels_y": spaces.Box(-inf, inf, (a,), np.float32),
        "ang_vels_z": spaces.Box(-inf, inf, (a,), np.float32),
        "collisions": spaces.Box(0.0, 1.0, (a,), np.float32),
        "lap_times": spaces.Box(0.0, inf, (a,), np.float32),
        "lap_counts": spaces.Box(0.0, inf, (a,), np.float32),
    })


class F110VectorEnv(VectorEnv):
    """``gymnasium.vector.VectorEnv`` facade over :class:`VecF110Env`.

    Constructor kwargs are :class:`VecF110Env`'s (map/map_ext/num_agents/
    timestep/params/multi-map ``map`` lists/``randomize_starts``/every
    SimConfig field).  ``reset`` takes start poses via
    ``options={"poses": ...}`` ((A, 3) broadcast to all envs, or (E, A, 3));
    without them agents spawn staggered behind the reference's example
    start pose.
    """

    metadata = {"autoreset_mode": AutoresetMode.SAME_STEP}

    def __init__(self, num_envs: int, **kwargs):
        self.render_mode = None
        self.num_envs = int(num_envs)
        self.vec = VecF110Env(num_envs=self.num_envs,
                              return_final_obs=True, **kwargs)
        cfg = self.vec.cfg
        a, b = cfg.num_agents, cfg.num_beams
        p = self.vec.params.vehicle
        lo = np.array([float(np.min(np.asarray(p.s_min))),
                       float(np.min(np.asarray(p.v_min)))], np.float32)
        hi = np.array([float(np.max(np.asarray(p.s_max))),
                       float(np.max(np.asarray(p.v_max)))], np.float32)
        self.single_action_space = spaces.Box(
            low=np.tile(lo, (a, 1)), high=np.tile(hi, (a, 1)),
            dtype=np.float32)
        self.single_observation_space = _single_obs_space(a, b)
        self.action_space = batch_space(self.single_action_space,
                                        self.num_envs)
        self.observation_space = batch_space(self.single_observation_space,
                                             self.num_envs)

    @staticmethod
    def _np_obs(obs: dict) -> dict:
        return {k: np.asarray(v, np.float32) for k, v in obs.items()
                if k != "ego_idx"}

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            import jax
            self.vec._key = jax.random.PRNGKey(seed)
        poses = None if options is None else options.get("poses")
        if poses is None:
            a = self.vec.cfg.num_agents
            poses = np.array([[_DEFAULT_POSE[0] - 0.6 * (i // 2),
                               -1.0 * (i % 2), _DEFAULT_POSE[2]]
                              for i in range(a)])
        obs, _reward, _done, _info = self.vec.reset(np.asarray(poses))
        return self._np_obs(obs), {}

    def step(self, actions):
        obs, reward, done, info = self.vec.step(np.asarray(actions))
        term = np.asarray(done, bool)
        infos = {"checkpoint_done": np.asarray(info["checkpoint_done"])}
        if "final_obs" in info:
            # same-step autoreset: terminal observations as stacked arrays
            # + the standard presence mask
            infos["final_obs"] = self._np_obs(info["final_obs"])
            infos["_final_obs"] = term.copy()
        return (self._np_obs(obs), np.asarray(reward, np.float32), term,
                np.zeros_like(term), infos)

    def render(self):
        return None

    def close_extras(self, **kwargs):
        pass
