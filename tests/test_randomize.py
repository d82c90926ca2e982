"""Domain randomization at auto-reset: fresh track + start pose per episode."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu import env as envlib, rollout as ro

DATA = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu", "assets", "data")
CFG = SimConfig(num_agents=1, num_beams=54, dtype="float64", scan_mode="fast",
                rt_theta_bins=16, rt_pose_stride=16, scan_noise_std=0.0,
                rt_occlusion="off", rt_grad=False)


@pytest.mark.slow
def test_randomized_resets_draw_new_maps():
    yamls = sorted(glob.glob(os.path.join(DATA, "track_*.yaml")))[:3]
    params = envlib.make_multimap_params(CFG, yamls)
    starts = []
    for y in yamls:
        w = np.loadtxt(y.replace(".yaml", "_waypoints.csv"), delimiter=";",
                       comments="#")
        th = np.arctan2(w[1, 2] - w[0, 2], w[1, 1] - w[0, 1])
        starts.append([[w[0, 1], w[0, 2], th]])
    starts = jnp.asarray(starts, jnp.float64)            # (M, 1, 3)

    n_env = 8
    map_idx = np.zeros(n_env, np.int32)                  # all begin on map 0
    poses = jnp.broadcast_to(starts[0], (n_env, 1, 3))
    keys = jax.random.split(jax.random.PRNGKey(0), n_env)
    states, obs, *_ = ro.batched_reset(CFG, params, poses, keys,
                                       map_idx=map_idx)

    # a policy that crashes fast: full speed, hard steer
    def kamikaze(obs, key):
        return jnp.tile(jnp.asarray([[0.35, 8.0]], jnp.float64), (n_env, 1, 1))

    run = ro.make_rollout(CFG, params, kamikaze, steps=400,
                          randomize_starts=starts)
    carry, (rewards, dones) = run(ro.RolloutCarry(states, obs,
                                                  jax.random.PRNGKey(1)))
    assert np.asarray(dones).sum() > 0, "nobody crashed -> no resets exercised"
    final_maps = np.asarray(carry.state.map_idx)
    assert len(np.unique(final_maps)) >= 2, \
        f"resets never drew a different map: {final_maps}"
    # spawn poses must belong to the assigned map's start
    sx = np.asarray(starts)[final_maps, 0, 0]
    assert np.all(np.isfinite(np.asarray(carry.obs.scans)))
    assert np.asarray(carry.obs.scans).min() >= 0.0
