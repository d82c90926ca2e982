"""Vectorized stateful wrapper: batched semantics, auto-reset, multi-map."""

import glob
import os

import numpy as np
import pytest

from red_gym_tpu.vec_env import VecF110Env

from tests._assets import requires_reference

pytestmark = requires_reference

MAP = "/root/reference/examples/example_map"
DATA = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu", "assets", "data")
START = np.array([[0.7, 0.0, 1.37079632679], [0.7, -1.0, 1.37079632679]])


@pytest.mark.slow
def test_vec_env_step_batch():
    env = VecF110Env(MAP, num_envs=6, num_agents=2, num_beams=108,
                     dtype="float64")
    obs, reward, done, info = env.reset(START)
    assert obs["scans"].shape == (6, 2, 108)
    acts = np.tile([[0.05, 2.0], [0.0, 1.5]], (6, 1, 1))
    for _ in range(3):
        obs, reward, done, info = env.step(acts)
    assert obs["poses_x"].shape == (6, 2)
    assert not np.any(np.asarray(done))
    # all envs identical inputs -> identical states (no cross-env leakage)
    np.testing.assert_array_equal(np.asarray(obs["poses_x"][0]),
                                  np.asarray(obs["poses_x"][5]))


@pytest.mark.slow
def test_vec_env_auto_reset():
    """An env driven into the wall restarts from its start pose."""
    env = VecF110Env(MAP, num_envs=4, num_agents=1, num_beams=108,
                     dtype="float64")
    obs, *_ = env.reset(START[:1])
    acts = np.tile([[0.0, 8.0]], (4, 1, 1))     # full speed at the wall
    hit = False
    for _ in range(300):
        obs, reward, done, info = env.step(acts)
        if np.any(np.asarray(done)):
            hit = True
            break
    assert hit, "never collided driving straight at a wall"
    # crashed envs reset within the same step; stragglers (per-env scan noise
    # shifts the iTTC trigger by a step or two) crash and reset on the next
    # few slow steps, after which everyone is back near start and alive
    slow = np.tile([[0.0, 0.5]], (4, 1, 1))
    for _ in range(5):
        obs, reward, done, info = env.step(slow)
    assert not np.any(np.asarray(done))
    assert np.all(np.abs(np.asarray(obs["poses_x"])) < 5.0)


@pytest.mark.slow
def test_vec_env_randomized_resets_draw_fresh_maps():
    """With randomize_starts, auto-reset re-draws each crashed env's track
    uniformly (state.map_idx changes over episodes) and spawns it at that
    track's start pose."""
    maps = [y[:-5] for y in sorted(glob.glob(os.path.join(DATA, "track_*.yaml")))[:3]]
    starts = []
    for m in maps:
        w = np.loadtxt(m + "_waypoints.csv", delimiter=";", comments="#")
        th = np.arctan2(w[1, 2] - w[0, 2], w[1, 1] - w[0, 1])
        starts.append([[w[0, 1], w[0, 2], th]])
    starts = np.asarray(starts)                       # (3, 1, 3)
    env = VecF110Env(maps, num_envs=6, num_agents=1, num_beams=54,
                     dtype="float64", march_iters=24, scan_noise_std=0.0,
                     map_idx=np.zeros(6, np.int64),
                     randomize_starts=starts)
    env.reset(starts[np.zeros(6, np.int64)])
    acts = np.tile([[0.0, 8.0]], (6, 1, 1))           # drive into walls
    seen = set()
    for _ in range(400):
        obs, reward, done, info = env.step(acts)
        seen.update(np.asarray(env.states.map_idx).tolist())
        if len(seen) == 3:
            break
    assert len(seen) == 3, f"resets never drew all 3 maps: {seen}"
    # every env pose is at one of the start regions or on-track (finite)
    assert np.all(np.isfinite(np.asarray(obs["poses_x"])))


def test_vec_env_rejects_unknown_kwargs():
    """Typo'd config options raise instead of being silently dropped."""
    with pytest.raises(TypeError, match="scan_modee"):
        VecF110Env(MAP, num_envs=2, num_agents=1, scan_modee="fast")


def test_vec_env_multi_map():
    maps = [y[:-5] for y in sorted(glob.glob(os.path.join(DATA, "track_*.yaml")))[:2]]
    wpts = [np.loadtxt(m + "_waypoints.csv", delimiter=";", comments="#")
            for m in maps]
    poses = np.stack([
        [[w[0, 1], w[0, 2], np.arctan2(w[1, 2] - w[0, 2], w[1, 1] - w[0, 1])]]
        for w in wpts])                                    # (2, 1, 3)
    poses = np.tile(poses, (2, 1, 1))                      # envs 0,1,2,3
    env = VecF110Env(maps, num_envs=4, num_agents=1, num_beams=54,
                     dtype="float64", scan_mode="fast", rt_theta_bins=16,
                     rt_pose_stride=16, scan_noise_std=0.0,
                     rt_occlusion="off", rt_grad=False,
                     map_idx=np.array([0, 1, 0, 1]))
    obs, *_ = env.reset(poses)
    scans = np.asarray(obs["scans"])
    assert np.all(np.isfinite(scans)) and np.all(scans > 0.05)
    # envs on the same map at the same pose agree; different maps differ
    np.testing.assert_array_equal(scans[0], scans[2])
    assert not np.allclose(scans[0], scans[1])
