"""PPO training-step tests: learning signal, opponent policy hook."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu import env as envlib
from red_gym_tpu.agents import pure_pursuit as pp
from red_gym_tpu.agents.ppo import PPO, PPOConfig, ScanPolicy, pure_pursuit_opponents

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map.yaml"
WPT_CSV = "/root/reference/examples/example_waypoints.csv"
CFG = SimConfig(num_agents=2, num_beams=64, timestep=0.01, dtype="float64",
                march_iters=16)
START = np.array([[0.7, 0.0, 1.37079632679], [0.7, -1.0, 1.37079632679]])


@pytest.fixture(scope="module")
def setup():
    params = envlib.make_params(CFG, MAP_YAML, ".png")
    poses = jnp.tile(jnp.asarray(START, jnp.float64), (8, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    reset_v = jax.jit(jax.vmap(
        lambda pr, po, k: envlib.reset(CFG, pr, po, k), in_axes=(None, 0, 0)))
    states, obs, *_ = reset_v(params, poses, keys)
    return params, states, obs


def _train_once(params, states, obs, opponent_plan=None):
    ppo = PPO(CFG, params, PPOConfig(rollout_len=4, minibatches=2, epochs=1),
              ScanPolicy(hidden=32, scan_stride=4), opponent_plan=opponent_plan)
    pstate = ppo.init(jax.random.PRNGKey(1))
    train = jax.jit(lambda ps, s, o, ep: ppo.train_step(ps, s, o, ep))
    pstate2, states2, obs2, metrics = train(pstate, states, obs, params)
    return pstate, pstate2, states2, obs2, metrics


@pytest.mark.slow
def test_train_step_updates_params(setup):
    params, states, obs = setup
    pstate, pstate2, _, _, metrics = _train_once(params, states, obs)
    assert np.isfinite(float(metrics["loss"]))
    changed = any(bool(jnp.any(a != b)) for a, b in
                  zip(jax.tree.leaves(pstate.params), jax.tree.leaves(pstate2.params)))
    assert changed, "no parameter moved after a train step"


@pytest.mark.slow
def test_custom_reward_fn_changes_learning_signal(setup):
    """PPO(reward_fn=...) feeds the shaping into GAE/returns: a constant
    reward yields a different reward_mean (and loss) than the default
    progress-collision shaping."""
    params, states, obs = setup

    def constant_reward(cfg, o, o2):
        return jnp.ones_like(o2.linear_vels_x[:, cfg.ego_idx])

    ppo_d = PPO(CFG, params, PPOConfig(rollout_len=4, minibatches=2, epochs=1),
                ScanPolicy(hidden=32, scan_stride=4))
    ppo_c = PPO(CFG, params, PPOConfig(rollout_len=4, minibatches=2, epochs=1),
                ScanPolicy(hidden=32, scan_stride=4),
                reward_fn=constant_reward)
    m = {}
    for name, ppo in (("default", ppo_d), ("const", ppo_c)):
        pstate = ppo.init(jax.random.PRNGKey(1))
        train = jax.jit(lambda ps, s, o, ep, _p=ppo: _p.train_step(ps, s, o, ep))
        _, _, _, metrics = train(pstate, states, obs, params)
        m[name] = metrics
    assert float(m["const"]["reward_mean"]) == pytest.approx(1.0)
    assert float(m["default"]["reward_mean"]) != pytest.approx(1.0)


@pytest.mark.slow  # multi-map PPO composition; full lane
def test_multimap_pursuit_opponents_per_track(setup):
    """pure_pursuit_opponents_multi picks each env's raceline by map_idx:
    two envs at the same pose but different map indices get different
    opponent controls when the racelines differ."""
    import glob
    import os

    from red_gym_tpu.agents.ppo import pure_pursuit_opponents_multi

    data = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                        "assets", "data")
    yamls = sorted(glob.glob(os.path.join(data, "track_*.yaml")))[:2]
    ppps = []
    for y in yamls:
        w = np.loadtxt(y.replace(".yaml", "_waypoints.csv"),
                       delimiter=";", comments="#")
        ppps.append(pp.make_params(jnp.asarray(w[:, [1, 2, 5]], jnp.float64)))
    hook = pure_pursuit_opponents_multi(pp.stack_params(ppps))

    _, states, obs = setup
    e = obs.poses_x.shape[0]
    mi0 = jnp.zeros((e,), jnp.int32)
    mi1 = jnp.ones((e,), jnp.int32)
    c0 = np.asarray(hook(obs, mi0))
    c1 = np.asarray(hook(obs, mi1))
    assert c0.shape == (e, 2, 2) and np.isfinite(c0).all()
    assert not np.allclose(c0, c1), \
        "different map indices produced identical opponent plans"


@pytest.mark.slow
def test_pursuit_opponents_move_along_track(setup):
    """With the pure-pursuit opponent hook, non-ego agents make forward
    progress (unlike the hold-straight default which quickly crashes or
    stalls off the raceline)."""
    params, states, obs = setup
    wpts = pp.load_waypoints_csv(WPT_CSV, dtype=jnp.float64)
    hook = pure_pursuit_opponents(pp.make_params(wpts))

    ctrl = hook(obs)
    assert ctrl.shape == (8, 2, 2)
    assert np.all(np.isfinite(np.asarray(ctrl)))

    _, _, states2, obs2, _ = _train_once(params, states, obs, opponent_plan=hook)
    # opponent (agent 1) moved and did not collide in 4 steps
    moved = np.asarray(obs2.poses_y[:, 1]) - np.asarray(obs.poses_y[:, 1])
    assert np.all(np.abs(moved) > 1e-3)
    assert not np.any(np.asarray(obs2.collisions[:, 1]) > 0)
