"""Gymnasium adapter + legacy gym-compat shim tests (VERDICT r2 item 6).

The reference registers a classic gym env as 'f110_gym:f110-v0'
(reference: gym/f110_gym/__init__.py:1-5).  Here: a gymnasium.Env facade
registered as 'f110-v0' plus a gym_compat.make that serves reference-style
4-tuple scripts unchanged.
"""

import os

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

import red_gym_tpu  # noqa: E402  (import triggers registration)
from red_gym_tpu import gym_compat  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                    "assets", "data")
MAP = os.path.join(DATA, "track_wide")

KW = dict(map=MAP, map_ext=".png", num_agents=1, num_beams=108,
          timestep=0.01)


def test_registration():
    assert "f110-v0" in gymnasium.registry


def test_gymnasium_api_roundtrip():
    env = gymnasium.make("f110-v0", **KW)
    obs, info = env.reset(options={"poses": np.array([[0.0, 0.0, 0.0]])})
    assert env.observation_space.contains(obs), "obs outside declared space"
    assert "checkpoint_done" in info
    act = np.zeros((1, 2), np.float32)
    obs, reward, terminated, truncated, info = env.step(act)
    assert isinstance(reward, float) and isinstance(terminated, bool)
    assert truncated is False
    assert obs["scans"].shape == (1, 108)
    env.close()


def test_default_poses_and_seed():
    env = gymnasium.make("f110-v0", **KW)
    obs1, _ = env.reset(seed=7)
    obs2, _ = env.reset(seed=7)
    np.testing.assert_array_equal(obs1["scans"], obs2["scans"])
    env.close()


def test_action_space_bounds_match_vehicle():
    env = gymnasium.make("f110-v0", **KW).unwrapped
    lo, hi = env.action_space.low, env.action_space.high
    assert lo.shape == (1, 2)
    np.testing.assert_allclose(lo[0], [-0.4189, -5.0], atol=1e-6)
    np.testing.assert_allclose(hi[0], [0.4189, 20.0], atol=1e-6)


def test_gym_compat_legacy_4tuple():
    """The reference main-loop contract: reset(poses) AND step both return
    the classic 4-tuple with the legacy obs dict keys
    (reference examples/waypoint_follow.py:275-283)."""
    env = gym_compat.make("f110_gym:f110-v0", **KW)
    out = env.reset(np.array([[0.0, 0.0, 0.0]]))
    assert len(out) == 4
    obs, step_reward, done, info = out
    for k in ("ego_idx", "scans", "poses_x", "poses_y", "poses_theta",
              "linear_vels_x", "linear_vels_y", "ang_vels_z", "collisions",
              "lap_times", "lap_counts"):
        assert k in obs, k
    obs, step_reward, done, info = env.step(np.array([[0.0, 1.0]]))
    assert isinstance(done, bool) and "checkpoint_done" in info


def test_gym_compat_unknown_id():
    with pytest.raises(ValueError):
        gym_compat.make("CartPole-v1")
