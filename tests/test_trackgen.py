"""Track generator tests: generated maps load and are drivable."""


import numpy as np
import jax
import jax.numpy as jnp

from red_gym_tpu.maps import trackgen
from red_gym_tpu.maps.loader import load_map
from red_gym_tpu.config import SimConfig
from red_gym_tpu import env as envlib
from red_gym_tpu.agents import pure_pursuit as pp


def test_generate_and_load(tmp_path):
    yaml_path = trackgen.generate(str(tmp_path), seed=7)
    tmap = load_map(yaml_path, ".png", dtype=jnp.float64)
    occ = np.asarray(tmap.occupancy)
    frac_free = (occ == 255).mean()
    assert 0.03 < frac_free < 0.6  # a corridor, not empty or full
    # the generated centerline lies in free space
    wpts = np.loadtxt(yaml_path.replace(".yaml", "_waypoints.csv"),
                      delimiter=";", skiprows=3)
    res = float(tmap.resolution)
    for x, y in wpts[::50, 1:3]:
        c = int((x - float(tmap.orig_x)) / res)
        r = int((y - float(tmap.orig_y)) / res)
        assert occ[r, c] == 255, f"waypoint ({x},{y}) inside a wall"


def test_pure_pursuit_laps_generated_track(tmp_path):
    """End-to-end: the planner completes laps on a freshly generated map."""
    yaml_path = trackgen.generate(str(tmp_path), seed=3)
    cfg = SimConfig(num_agents=1, num_beams=108, timestep=0.01, dtype="float64")
    params = envlib.make_params(cfg, yaml_path, ".png")
    wpts = pp.load_waypoints_csv(yaml_path.replace(".yaml", "_waypoints.csv"),
                                 delim=";", skiprows=3, xind=1, yind=2, vind=5,
                                 dtype=jnp.float64)
    ppp = pp.make_params(wpts, tlad=1.0, vgain=0.75)

    start = np.array([[float(wpts[0, 0]), float(wpts[0, 1]),
                       float(np.arctan2(float(wpts[1, 1] - wpts[0, 1]),
                                        float(wpts[1, 0] - wpts[0, 0])))]])

    def body(carry, _):
        state, obs = carry
        speed, steer = pp.plan(obs.poses_x[0], obs.poses_y[0],
                               obs.poses_theta[0], ppp)
        state, obs, _, done, _ = envlib.step(
            cfg, params, state, jnp.stack([steer, speed])[None, :])
        return (state, obs), (done, obs.collisions[0])

    state, obs, *_ = envlib.reset(cfg, params, jnp.asarray(start),
                                  jax.random.PRNGKey(0))

    @jax.jit
    def rollout(s, o):
        return jax.lax.scan(body, (s, o), None, length=12000)

    (state, obs), (dones, colls) = rollout(state, obs)
    dones = np.asarray(dones)
    assert dones.any(), "never completed two laps on generated track"
    t_done = int(np.argmax(dones))
    # clean driving up to and including lap completion (the scan keeps
    # stepping past done; behavior there is unspecified)
    assert not np.any(np.asarray(colls)[: t_done + 1] > 0), \
        "crashed on generated track before finishing"
