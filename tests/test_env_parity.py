"""End-to-end environment parity: closed-loop pure-pursuit rollout on the
example map, our stateless env vs the reference Simulator, driven by the
same planner (the PR1 parity config: BASELINE.json config 1, reference
examples/waypoint_follow.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import Integrator, SimConfig, VehicleParams
from red_gym_tpu import env as envlib
from red_gym_tpu.agents import pure_pursuit as pp

MAP_YAML = "/root/reference/examples/example_map.yaml"
WPT_CSV = "/root/reference/examples/example_waypoints.csv"
START = np.array([[0.7, 0.0, 1.37079632679]])  # config_example_map.yaml sx/sy/stheta
PARAMS = {"mu": 1.0489, "C_Sf": 4.718, "C_Sr": 5.4562, "lf": 0.15875,
          "lr": 0.17145, "h": 0.074, "m": 3.74, "I": 0.04712,
          "s_min": -0.4189, "s_max": 0.4189, "sv_min": -3.2, "sv_max": 3.2,
          "v_switch": 7.319, "a_max": 9.51, "v_min": -5.0, "v_max": 20.0,
          "width": 0.31, "length": 0.58}


@pytest.fixture(scope="module")
def planner_params():
    wpts = pp.load_waypoints_csv(WPT_CSV, dtype=jnp.float64)
    return pp.make_params(wpts)


@pytest.fixture(scope="module")
def ours():
    cfg = SimConfig(num_agents=1, num_beams=1080, timestep=0.01,
                    integrator=Integrator.RK4, dtype="float64")
    params = envlib.make_params(cfg, MAP_YAML, ".png",
                                VehicleParams.from_dict(PARAMS, jnp.float64))
    return cfg, params


def test_trajectory_parity_vs_reference(reference, ours, planner_params):
    """1200 closed-loop steps: both sims driven by the identical planner;
    poses must agree to fp-accumulation tolerance (ulp-level per step)."""
    bc = reference.base_classes
    bc.RaceCar.scan_simulator = None
    sim = bc.Simulator(PARAMS, 1, 12345, 2 * np.pi, time_step=0.01,
                       integrator=bc.Integrator.RK4)
    sim.set_map(MAP_YAML, ".png")
    sim.reset(START)
    ref_obs = sim.step(np.zeros((1, 2)))  # reference reset performs one zero step

    cfg, params = ours
    jit_step = jax.jit(lambda p, s, a: envlib.step(cfg, p, s, a))
    state, obs, _, _, _ = envlib.reset(cfg, params, jnp.asarray(START),
                                       jax.random.PRNGKey(12345))

    n_steps = 1200
    max_err = 0.0
    for t in range(n_steps):
        # identical planner fed each sim's own observation
        sp_r, st_r = pp.plan(jnp.float64(ref_obs["poses_x"][0]),
                             jnp.float64(ref_obs["poses_y"][0]),
                             jnp.float64(ref_obs["poses_theta"][0]),
                             planner_params)
        sp_o, st_o = pp.plan(obs.poses_x[0], obs.poses_y[0], obs.poses_theta[0],
                             planner_params)

        ref_obs = sim.step(np.array([[float(st_r), float(sp_r)]]))
        state, obs, _, done, _ = jit_step(
            params, state, jnp.array([[st_o, sp_o]], dtype=jnp.float64))

        err = max(abs(ref_obs["poses_x"][0] - float(obs.poses_x[0])),
                  abs(ref_obs["poses_y"][0] - float(obs.poses_y[0])),
                  abs(ref_obs["poses_theta"][0] - float(obs.poses_theta[0])))
        max_err = max(max_err, err)
        assert err < 1e-6, f"diverged at step {t}: {err}"
        assert not bool(done)

    # the car must actually be racing, not parked
    assert abs(float(obs.linear_vels_x[0])) > 1.0
    print(f"max pose deviation over {n_steps} steps: {max_err:.3e}")
    bc.RaceCar.scan_simulator = None


def test_full_lap_completes(ours, planner_params):
    """Whole-lap rollout fully on device inside lax.scan: two laps complete
    (done via 4 finish-line toggles) with a plausible lap time."""
    cfg, params = ours
    ppp = planner_params

    def body(carry, _):
        state, obs = carry
        speed, steer = pp.plan(obs.poses_x[0], obs.poses_y[0],
                               obs.poses_theta[0], ppp)
        action = jnp.stack([steer, speed])[None, :]
        state, obs, reward, done, _ = envlib.step(cfg, params, state, action)
        return (state, obs), (done, obs.lap_counts[0], obs.collisions[0])

    state, obs, _, _, _ = envlib.reset(cfg, params, jnp.asarray(START),
                                       jax.random.PRNGKey(12345))

    @jax.jit
    def rollout(state, obs):
        return jax.lax.scan(body, (state, obs), None, length=6000)

    (state, obs), (dones, laps, colls) = rollout(state, obs)
    dones = np.asarray(dones)
    assert not np.any(np.asarray(colls) > 0), "crashed into a wall"
    assert dones.any(), "never finished two laps in 60 sim-seconds"
    t_done = int(np.argmax(dones))
    lap_time = float(state.lap_times[0]) if not dones.all() else t_done * cfg.timestep
    # two laps on the example map at these speeds: between 10 and 60 seconds
    assert 10.0 < (t_done + 2) * cfg.timestep < 60.0
    print("two-lap done at sim time", (t_done + 2) * cfg.timestep)


def test_collision_freezes_car(ours):
    """Driving straight into a wall sets the collision flag and done, and
    zeroes the dynamic state (reference base_classes.py:244-247)."""
    cfg, params = ours
    jit_step = jax.jit(lambda p, s, a: envlib.step(cfg, p, s, a))
    state, obs, _, done, _ = envlib.reset(cfg, params, jnp.asarray(START),
                                          jax.random.PRNGKey(0))
    act = jnp.array([[0.0, 8.0]], dtype=jnp.float64)  # full speed ahead
    hit = False
    for _ in range(600):
        state, obs, _, done, _ = jit_step(params, state, act)
        if bool(done):
            hit = True
            break
    assert hit, "never collided driving straight at a wall"
    assert float(obs.collisions[0]) == 1.0
    assert float(obs.linear_vels_x[0]) == 0.0
