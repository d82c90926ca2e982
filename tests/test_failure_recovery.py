"""Failure detection & recovery drills (SURVEY §5 gap: the reference has
none; its only failure concept is collision->done, f110_env.py:242).

Covers the production failure model for long batched runs:
  * fault injection: NaN-poisoned env states are detected per env and
    quarantine-reset in place while healthy envs march on undisturbed;
  * restart-from-checkpoint mid-training: killing a training run after an
    orbax checkpoint and restoring in a FRESH process-state reproduces the
    continuation exactly (training is a pure function of the checkpointed
    pytrees).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu import env as envlib
from red_gym_tpu.utils import checkpoint as ckpt
from red_gym_tpu.utils import debug

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map.yaml"
CFG = SimConfig(num_agents=2, num_beams=54, timestep=0.01, dtype="float32",
                march_iters=12)
START = np.array([[0.7, 0.0, 1.37079632679], [0.7, -1.0, 1.37079632679]])


@pytest.fixture(scope="module")
def params():
    return envlib.make_params(CFG, MAP_YAML, ".png")


def _batch(params, e=8):
    poses = jnp.tile(jnp.asarray(START, jnp.float32), (e, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), e)
    f = jax.jit(jax.vmap(lambda po, k: envlib.reset(CFG, params, po, k)))
    return f(poses, keys)


def test_nan_injection_quarantined(params):
    """Poison two envs with NaNs mid-run; quarantine_reset restarts exactly
    those two and leaves the rest bit-identical."""
    states, obs, *_ = _batch(params, e=8)
    act = jnp.tile(jnp.asarray([[0.1, 3.0], [0.0, 2.0]], jnp.float32),
                   (8, 1, 1))
    step = jax.jit(jax.vmap(lambda s, a: envlib.step(CFG, params, s, a)))
    for _ in range(5):
        states, obs, *_ = step(states, act)

    x = np.asarray(states.x).copy()
    x[2, 0, 3] = np.nan                      # env 2: NaN velocity
    x[5, 1, :] = np.inf                      # env 5: whole opponent state
    x[6, 0, 5] = 1e35                        # env 6: huge-but-FINITE yaw
    #   rate — the stiff-dynamics pre-NaN stage env_health_mask must catch
    poisoned = states._replace(x=jnp.asarray(x))

    fix = jax.jit(lambda s, o, k: debug.quarantine_reset(CFG, params, s, o, k))
    fixed, fobs, healthy = fix(poisoned, obs, jax.random.PRNGKey(7))

    np.testing.assert_array_equal(np.asarray(healthy),
                                  [1, 1, 0, 1, 1, 0, 0, 1])
    fx = np.asarray(fixed.x)
    assert np.isfinite(fx).all(), "quarantine left non-finite state behind"
    # poisoned envs are back at their start pose with zeroed dynamics
    np.testing.assert_allclose(fx[2, :, 0:2], START[:, 0:2], atol=0.05)
    assert float(fixed.current_time[2]) == pytest.approx(CFG.timestep)
    # healthy envs bit-identical, still mid-episode
    for e in (0, 1, 3, 4, 7):
        np.testing.assert_array_equal(fx[e], np.asarray(poisoned.x)[e])
        assert float(fixed.current_time[e]) == float(poisoned.current_time[e])
    # and the whole batch steps on without propagating anything
    states2, obs2, *_ = step(fixed, act)
    assert np.isfinite(np.asarray(states2.x)).all()
    assert np.isfinite(np.asarray(obs2.scans)).all()


def test_fresh_states_all_healthy(params):
    states, obs, *_ = _batch(params, e=4)
    assert bool(debug.env_health_mask(states).all())


@pytest.mark.slow
def test_checkpoint_restart_drill(tmp_path, params):
    """The mid-training restart drill: run A trains 2+3 iterations with a
    checkpoint after iteration 2; run B restores that checkpoint into a
    freshly constructed trainer (simulating a process restart after a
    failure) and trains the remaining 3. Final parameters and env states
    must match run A exactly — resume loses nothing."""
    from red_gym_tpu.agents.ppo import PPO, PPOConfig, ScanPolicy

    states, obs, *_ = _batch(params, e=8)
    ppo = PPO(CFG, params, PPOConfig(rollout_len=4, minibatches=2, epochs=1),
              ScanPolicy(hidden=32, scan_stride=4))
    train = jax.jit(lambda ps, s, o, ep: ppo.train_step(ps, s, o, ep))

    pstate = ppo.init(jax.random.PRNGKey(1))
    for _ in range(2):
        pstate, states, obs, _ = train(pstate, states, obs, params)
    ckpt.save(str(tmp_path / "trainer"), {"pstate": pstate, "states": states,
                                          "obs": obs})

    # run A: continue in-process
    pa, sa, oa = pstate, states, obs
    for _ in range(3):
        pa, sa, oa, _ = train(pa, sa, oa, params)

    # run B: "process restart" — fresh trainer object, restore, continue
    ppo_b = PPO(CFG, params,
                PPOConfig(rollout_len=4, minibatches=2, epochs=1),
                ScanPolicy(hidden=32, scan_stride=4))
    train_b = jax.jit(lambda ps, s, o, ep: ppo_b.train_step(ps, s, o, ep))
    blob = ckpt.restore(str(tmp_path / "trainer"),
                        like={"pstate": pstate, "states": states, "obs": obs})
    pb, sb, ob = blob["pstate"], blob["states"], blob["obs"]
    for _ in range(3):
        pb, sb, ob, _ = train_b(pb, sb, ob, params)

    for a, b in zip(jax.tree.leaves(pa.params), jax.tree.leaves(pb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(sa.x), np.asarray(sb.x))
    np.testing.assert_array_equal(np.asarray(oa.scans), np.asarray(ob.scans))
