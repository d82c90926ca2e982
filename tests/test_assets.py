"""Packaged track assets: loadable, drivable, multi-map batchable."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu import env as envlib, rollout as ro
from red_gym_tpu.maps.loader import load_map, stack_maps

DATA = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu", "assets", "data")
CFG = SimConfig(num_agents=1, num_beams=64, dtype="float64", march_iters=24)


def _yamls():
    return sorted(glob.glob(os.path.join(DATA, "track_*.yaml")))


def test_assets_present_and_loadable():
    yamls = _yamls()
    assert len(yamls) >= 5, "expected at least 5 packaged tracks"
    for y in yamls:
        m = load_map(y, ".png", dtype=jnp.float64)
        assert float(jnp.max(m.dt)) > 1.0, f"{y}: no free space"
        csv = y.replace(".yaml", "_waypoints.csv")
        wpts = np.loadtxt(csv, delimiter=";", comments="#")
        assert wpts.shape[1] >= 6 and wpts.shape[0] > 50


def _start_poses(yamls):
    poses = []
    for y in yamls:
        w = np.loadtxt(y.replace(".yaml", "_waypoints.csv"), delimiter=";",
                       comments="#")
        dx, dy = w[1, 1] - w[0, 1], w[1, 2] - w[0, 2]
        poses.append([w[0, 1], w[0, 2], np.arctan2(dy, dx)])
    return jnp.asarray(poses, jnp.float64)[:, None, :]


@pytest.mark.slow
def test_map_idx_matches_per_env_maps():
    """The copy-free shared-stack + map_idx path produces exactly the same
    scans/states as vmapping per-env map copies (map_axis=0)."""
    yamls = _yamls()[:3]
    params_idx = envlib.make_multimap_params(CFG, yamls)
    # per-env-copy path padded to the same shape
    pad = tuple(params_idx.tmap.dt.shape[-2:])
    maps = [load_map(y, ".png", dtype=jnp.float64, pad_to=pad) for y in yamls]
    params_axis = envlib.make_params(CFG, yamls[0])._replace(
        tmap=stack_maps(maps))

    poses = _start_poses(yamls)
    keys = jax.random.split(jax.random.PRNGKey(3), len(yamls))
    s1, o1, *_ = ro.batched_reset(CFG, params_axis, poses, keys, map_axis=0)
    s2, o2, *_ = ro.batched_reset(CFG, params_idx, poses, keys,
                                  map_idx=np.arange(len(yamls)))
    np.testing.assert_array_equal(np.asarray(o1.scans), np.asarray(o2.scans))
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))

    acts = jnp.tile(jnp.asarray([[0.0, 1.0]], jnp.float64), (len(yamls), 1, 1))
    s1, o1, *_ = ro.batched_step(CFG, params_axis, s1, acts, map_axis=0)
    s2, o2, *_ = ro.batched_step(CFG, params_idx, s2, acts)
    np.testing.assert_array_equal(np.asarray(o1.scans), np.asarray(o2.scans))


@pytest.mark.slow
def test_map_idx_fast_mode():
    """Fast scan mode with stacked range textures + map_idx: envs on
    different tracks scan their own map."""
    import dataclasses

    cfg = dataclasses.replace(CFG, scan_mode="fast", rt_theta_bins=32,
                              rt_pose_stride=16, rt_occlusion="off",
                              rt_grad=False)
    yamls = _yamls()[:2]
    params = envlib.make_multimap_params(cfg, yamls)
    poses = _start_poses(yamls)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    states, obs, *_ = ro.batched_reset(cfg, params, poses, keys,
                                       map_idx=np.array([0, 1]))
    assert np.all(np.isfinite(np.asarray(obs.scans)))
    assert np.all(np.asarray(obs.scans) > 0.1)
    # swapping map assignment changes the scans (envs really read their map)
    states_x, obs_x, *_ = ro.batched_reset(cfg, params, poses, keys,
                                           map_idx=np.array([1, 0]))
    assert not np.allclose(np.asarray(obs.scans), np.asarray(obs_x.scans))


@pytest.mark.slow
def test_multi_map_batched_rollout():
    """Each env runs on a different packaged track (padded to common shape),
    spawned at its own raceline start, stepped with constant slow actions:
    nobody should collide within a few steps."""
    yamls = _yamls()[:4]
    hw = []
    for y in yamls:
        m = load_map(y, ".png", dtype=jnp.float64)
        hw.append((int(m.height), int(m.width)))
    pad = (max(h for h, _ in hw), max(w for _, w in hw))
    maps = [load_map(y, ".png", dtype=jnp.float64, pad_to=pad) for y in yamls]
    tmap = stack_maps(maps)

    params = envlib.make_params(CFG, yamls[0], ".png")._replace(tmap=tmap)
    poses = []
    for y in yamls:
        w = np.loadtxt(y.replace(".yaml", "_waypoints.csv"), delimiter=";",
                       comments="#")
        dx, dy = w[1, 1] - w[0, 1], w[1, 2] - w[0, 2]
        poses.append([w[0, 1], w[0, 2], np.arctan2(dy, dx)])
    poses = jnp.asarray(poses, jnp.float64)[:, None, :]          # (E, 1, 3)
    keys = jax.random.split(jax.random.PRNGKey(0), len(yamls))

    states, obs, *_ = ro.batched_reset(CFG, params, poses, keys, map_axis=0)
    acts = jnp.tile(jnp.asarray([[0.0, 1.0]], jnp.float64), (len(yamls), 1, 1))
    for _ in range(5):
        states, obs, r, d, _ = ro.batched_step(CFG, params, states, acts,
                                               map_axis=0)
    assert not np.any(np.asarray(obs.collisions) > 0)
    assert np.all(np.asarray(obs.scans) > 0.2), "scans suspiciously short"
