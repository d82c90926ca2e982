"""Gym-style wrapper API tests: the reference's user-facing surface."""

import numpy as np
import jax.numpy as jnp
import pytest

from red_gym_tpu import env as envlib
from red_gym_tpu.config import Integrator
from red_gym_tpu.agents.pure_pursuit import FlippyPlanner

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map"
START = np.array([[0.7, 0.0, 1.37079632679]])


@pytest.fixture(scope="module")
def env():
    return envlib.make(map=MAP_YAML, map_ext=".png", num_agents=1,
                       timestep=0.01, integrator=Integrator.RK4,
                       num_beams=1080, dtype="float64")


def test_reset_step_legacy_dict(env):
    """Obs dict carries the reference's keys (base_classes.py:587-605,
    f110_env.py:277-278) and the 4-tuple step contract."""
    obs, reward, done, info = env.reset(START)
    for key in ("ego_idx", "scans", "poses_x", "poses_y", "poses_theta",
                "linear_vels_x", "linear_vels_y", "ang_vels_z", "collisions",
                "lap_times", "lap_counts"):
        assert key in obs, key
    assert obs["ego_idx"] == 0
    assert obs["scans"].shape == (1, 1080)
    assert reward == pytest.approx(0.01)
    assert not done
    assert info["checkpoint_done"].shape == (1,)

    obs2, r2, d2, _ = env.step(np.array([[0.0, 2.0]]))
    assert obs2["linear_vels_x"][0] > 0.0
    assert float(obs2["linear_vels_y"][0]) == 0.0  # reference hardcodes 0


def test_update_params_per_agent():
    env = envlib.make(map=MAP_YAML, map_ext=".png", num_agents=2,
                      num_beams=108, dtype="float64")
    env.update_params({"mu": 0.9}, index=1)
    mu = np.asarray(env.params.vehicle.mu)
    assert mu.shape == (2,)
    assert mu[0] == pytest.approx(1.0489) and mu[1] == pytest.approx(0.9)
    env.update_params({"mu": 1.2})   # all agents
    assert np.allclose(np.asarray(env.params.vehicle.mu), 1.2)


def test_update_map(env):
    berlin = "/root/reference/gym/f110_gym/envs/maps/berlin.yaml"
    h_before = int(env.params.tmap.height)
    env.update_map(berlin, ".png")
    assert int(env.params.tmap.height) != h_before
    env.update_map(MAP_YAML + ".yaml", ".png")  # restore for other tests


def test_update_map_rebuilds_range_texture():
    """Regression: in fast scan mode update_map must rebuild the map-derived
    range texture, not keep a stale one from the old map."""
    from red_gym_tpu.env import F110Env

    env = F110Env(map=MAP_YAML, map_ext=".png", num_agents=1, num_beams=54,
                  dtype="float64", scan_mode="fast", rt_theta_bins=16,
                  rt_pose_stride=16, rt_occlusion="off", rt_grad=False)
    rt_before = env.params.rtex.rt
    env.update_map("/root/reference/gym/f110_gym/envs/maps/berlin.yaml", ".png")
    assert env.params.rtex.rt.shape != rt_before.shape or \
        not bool((env.params.rtex.rt == rt_before).all())


def test_flippy_planner_probe(env):
    """The reference's adversarial integrator probe
    (examples/waypoint_follow.py:220-238): alternating hard steer at low
    speed must not blow up the integrator (states stay finite)."""
    planner = FlippyPlanner(speed=0.2, flip_every=1, steer=10)
    obs, *_ = env.reset(START)
    for t in range(200):
        speed, steer = planner.plan_step(jnp.int32(t))
        obs, _, done, _ = env.step(np.array([[float(steer), float(speed)]]))
        assert np.all(np.isfinite(obs["scans"]))
        assert np.isfinite(obs["poses_x"][0])
        if done:
            break
