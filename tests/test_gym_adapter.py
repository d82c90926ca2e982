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


def test_registration_is_import_light():
    """``import red_gym_tpu`` must register f110-v0 WITHOUT loading the
    adapter (and with it the env/scan stack): entry points are strings,
    resolved by gymnasium at make() time.  A fresh interpreter keeps this
    honest — this process already imported everything."""
    import subprocess
    import sys

    code = (
        "import sys, red_gym_tpu\n"
        "assert 'red_gym_tpu.gym_adapter' not in sys.modules\n"
        "assert 'red_gym_tpu.env' not in sys.modules\n"
        "import gymnasium\n"
        "assert 'f110-v0' in gymnasium.registry\n"
        "print('LAZY_OK')\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0 and "LAZY_OK" in r.stdout, r.stderr[-2000:]


def test_register_falls_back_without_vector_entry_point(monkeypatch):
    """gymnasium < 1.0 has no vector_entry_point kwarg; register() must
    still register the single-env id instead of crashing the import."""
    from red_gym_tpu import gym_adapter

    calls = []

    def fake_register(**kw):
        if "vector_entry_point" in kw:
            raise TypeError("unexpected keyword argument "
                            "'vector_entry_point'")
        calls.append(kw)

    monkeypatch.setattr(gymnasium, "register", fake_register)
    monkeypatch.setattr(gymnasium, "registry", {})   # force re-registration
    gym_adapter.register()
    assert calls and calls[0]["id"] == "f110-v0"
    assert "vector_entry_point" not in calls[0]


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


def test_make_vec_api_roundtrip():
    """gymnasium.make_vec serves the on-device batch through the standard
    VectorEnv surface: batched spaces, 5-tuple step, same-step autoreset
    metadata (red_gym_tpu/gym_vector.py)."""
    envs = gymnasium.make_vec("f110-v0", num_envs=4, **KW)
    assert envs.num_envs == 4
    assert envs.metadata["autoreset_mode"] == \
        gymnasium.vector.AutoresetMode.SAME_STEP
    obs, info = envs.reset(seed=3)
    assert envs.observation_space.contains(obs), "obs outside batched space"
    assert obs["scans"].shape == (4, 1, 108)
    act = np.zeros((4, 1, 2), np.float32)
    obs, rew, term, trunc, infos = envs.step(act)
    assert rew.shape == term.shape == trunc.shape == (4,)
    assert term.dtype == bool and not trunc.any()
    # same-step autoreset contract: terminal obs + presence mask
    assert "final_obs" in infos and "_final_obs" in infos
    assert infos["final_obs"]["scans"].shape == (4, 1, 108)
    np.testing.assert_array_equal(infos["_final_obs"], term)
    envs.close()


def test_vector_env_autoresets_crashed_envs():
    """Envs driven into the wall terminate and come back reset in the SAME
    step: the returned obs is the fresh reset obs near the start pose while
    final_obs carries the terminal (at-the-wall) one."""
    envs = gymnasium.make_vec("f110-v0", num_envs=2, **KW)
    obs, _ = envs.reset(options={"poses": np.array([[0.0, 0.0, 0.0]])})
    act = np.tile(np.array([[0.0, 8.0]], np.float32), (2, 1, 1))
    for _ in range(300):
        obs, rew, term, trunc, infos = envs.step(act)
        if term.any():
            break
    assert term.any(), "never collided driving straight at a wall"
    e = int(np.argmax(term))
    np.testing.assert_array_equal(infos["_final_obs"], term)
    # post-step obs is the reset state (start pose, collision cleared); the
    # terminal obs carries the collision flag and the at-the-wall pose
    # (velocity is zero in BOTH: the iTTC hit freezes dynamic state within
    # the crash step, reference base_classes.py:227-252)
    assert abs(float(obs["poses_x"][e, 0])) < 1.0
    assert float(obs["collisions"][e, 0]) == 0.0
    assert float(infos["final_obs"]["collisions"][e, 0]) == 1.0
    assert float(infos["final_obs"]["poses_x"][e, 0]) > 1.0
    envs.close()
