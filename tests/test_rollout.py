"""Batched rollout driver tests: vmap consistency and auto-reset."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from red_gym_tpu.config import Integrator, SimConfig, VehicleParams
from red_gym_tpu import env as envlib, rollout as ro

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map.yaml"
START = np.array([[0.7, 0.0, 1.37079632679]])


def _setup(num_agents=1, dtype="float64", num_beams=108):
    cfg = SimConfig(num_agents=num_agents, num_beams=num_beams, timestep=0.01,
                    integrator=Integrator.RK4, dtype=dtype)
    params = envlib.make_params(cfg, MAP_YAML, ".png",
                                VehicleParams.default(cfg.jdtype))
    return cfg, params


@pytest.mark.slow
def test_batched_matches_single():
    """vmapped envs with identical inputs equal the single-env step."""
    cfg, params = _setup()
    e = 8
    poses = jnp.tile(jnp.asarray(START, jnp.float64), (e, 1, 1))
    keys = jnp.stack([jax.random.PRNGKey(0)] * e)

    states, obs, *_ = ro.batched_reset(cfg, params, poses, keys)
    s1, o1, *_ = envlib.reset(cfg, params, jnp.asarray(START, jnp.float64),
                              jax.random.PRNGKey(0))

    acts = jnp.tile(jnp.asarray([[0.1, 3.0]], jnp.float64), (e, 1, 1))
    states, obs, r, d, _ = ro.batched_step(cfg, params, states, acts)
    s1, o1, *_ = envlib.step(cfg, params, s1, acts[0])

    for i in range(e):
        np.testing.assert_array_equal(np.asarray(states.x[i]), np.asarray(s1.x))
        np.testing.assert_array_equal(np.asarray(obs.scans[i]), np.asarray(o1.scans))


@pytest.mark.slow
def test_auto_reset_restarts_crashed_envs():
    """Envs that crash into the wall restart from their start pose and keep
    stepping (the batched-RL auto-reset loop)."""
    cfg, params = _setup()
    e = 4
    poses = jnp.tile(jnp.asarray(START, jnp.float64), (e, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), e)
    states, obs, *_ = ro.batched_reset(cfg, params, poses, keys)

    # policy: drive straight at full speed -> guaranteed wall hit
    policy = lambda o, k: jnp.tile(jnp.asarray([[0.0, 8.0]], jnp.float64), (e, 1, 1))
    run = ro.make_rollout(cfg, params, policy, steps=700)
    carry, (rewards, dones) = run(ro.RolloutCarry(states, obs, jax.random.PRNGKey(2)))

    dones = np.asarray(dones)
    assert dones.any(), "no env ever crashed driving into a wall"
    # after auto-reset the final states are alive (not collided) and near start
    assert np.all(np.asarray(carry.state.collisions) == 0) or dones[-1].all() is False
    # every env that crashed was reset at least once: time rewound below max
    t = np.asarray(carry.state.current_time)
    assert np.all(t < 700 * cfg.timestep)


def test_two_agent_batched_race():
    """2-agent batched envs: opponent raycast shows up in the scans."""
    cfg, params = _setup(num_agents=2)
    e = 3
    poses = jnp.tile(jnp.asarray(
        [[0.7, 0.0, 1.37079632679], [0.7, -1.0, 1.37079632679]], jnp.float64),
        (e, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(3), e)
    states, obs, *_ = ro.batched_reset(cfg, params, poses, keys)
    assert obs.scans.shape == (e, 2, cfg.num_beams)
    # agent 1 looks ahead at agent 0 (1m away): some beams shortened below 1m
    assert float(obs.scans[0, 1].min()) < 1.0


def test_multi_map_batching():
    """Different (padded) maps per env via map_axis=0."""
    from red_gym_tpu.maps.loader import load_map, stack_maps

    cfg, _ = _setup()
    berlin = "/root/reference/gym/f110_gym/envs/maps/berlin.yaml"
    m1 = load_map(MAP_YAML, ".png", dtype=jnp.float64)
    m2 = load_map(berlin, ".png", dtype=jnp.float64)
    h = max(m1.dt.shape[0], m2.dt.shape[0])
    w = max(m1.dt.shape[1], m2.dt.shape[1])
    m1 = load_map(MAP_YAML, ".png", dtype=jnp.float64, pad_to=(h, w))
    m2 = load_map(berlin, ".png", dtype=jnp.float64, pad_to=(h, w))
    stacked = stack_maps([m1, m2])

    params = envlib.make_params(cfg, MAP_YAML, ".png",
                                VehicleParams.default(jnp.float64), tmap=stacked)
    poses = jnp.asarray(np.stack([START, np.array([[0.0, 0.0, 0.0]])]), jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    states, obs, *_ = ro.batched_reset(cfg, params, poses, keys, map_axis=0)

    # per-map scans equal the corresponding single-map env scans
    p1 = envlib.make_params(cfg, MAP_YAML, ".png", VehicleParams.default(jnp.float64))
    _, o1, *_ = envlib.reset(cfg, p1, poses[0], keys[0])
    np.testing.assert_array_equal(np.asarray(obs.scans[0]), np.asarray(o1.scans))
