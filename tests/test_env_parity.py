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

from tests._assets import requires_reference

pytestmark = requires_reference

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


@pytest.mark.slow
def test_trajectory_parity_vs_reference(reference, ours, planner_params):
    """1200 closed-loop steps, both sims driven by the identical planner.

    Two parity grades asserted in one reference pass (docs/parity.md):
      * EAGER f64 is BIT-EXACT — every op dispatches with numpy's exact
        rounding, `err == 0.0` for all 1200 steps;
      * jitted f64 stays within 1e-12 — XLA CPU contracts a*b+c into FMA
        (keeping MORE precision than numpy's two roundings), which no
        XLA flag disables; measured drift is ulp-level per step.
    """
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
    # eager twin: the documented bit-exact parity mode
    state_e = state
    obs_e = obs

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
        sp_e, st_e = pp.plan(obs_e.poses_x[0], obs_e.poses_y[0],
                             obs_e.poses_theta[0], planner_params)

        ref_obs = sim.step(np.array([[float(st_r), float(sp_r)]]))
        state, obs, _, done, _ = jit_step(
            params, state, jnp.array([[st_o, sp_o]], dtype=jnp.float64))
        state_e, obs_e, _, _, _ = envlib.step(
            cfg, params, state_e, jnp.array([[st_e, sp_e]], dtype=jnp.float64))

        ref_x = sim.agents[0].state
        err_e = np.abs(ref_x - np.asarray(state_e.x[0])).max()
        assert err_e == 0.0, \
            f"eager parity lost bit-exactness at step {t}: {err_e}"

        err = max(abs(ref_obs["poses_x"][0] - float(obs.poses_x[0])),
                  abs(ref_obs["poses_y"][0] - float(obs.poses_y[0])),
                  abs(ref_obs["poses_theta"][0] - float(obs.poses_theta[0])))
        max_err = max(max_err, err)
        assert err < 1e-12, f"jit diverged at step {t}: {err}"
        assert not bool(done)

    # the car must actually be racing, not parked
    assert abs(float(obs.linear_vels_x[0])) > 1.0
    print(f"max jit pose deviation over {n_steps} steps: {max_err:.3e}; "
          "eager bit-exact throughout")
    bc.RaceCar.scan_simulator = None


@pytest.mark.slow
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


def _soft_bang_controller(speed_cmd, steer_cmd, v, steer,
                          sv_max, a_max, v_max, v_min):
    """A deliberately non-PID low-level controller (saturated P speed loop
    with a non-reference gain + proportional steer-rate), pure jnp so the
    same callable runs in both sims.  Lipschitz on purpose: a discontinuous
    switching law would amplify per-step ulp differences into macroscopic
    divergence regardless of parity."""
    accl = jnp.clip(2.0 * (speed_cmd - v), -0.5 * a_max, 0.5 * a_max)
    sv = jnp.clip(10.0 * (steer_cmd - steer), -sv_max, sv_max)
    return accl, sv


@pytest.mark.slow
def test_custom_speed_controller_parity(reference, planner_params):
    """Fork delta (reference base_classes.py:68,91,280): swap a custom
    speed_controller into BOTH sims; closed-loop trajectories must still
    match — and must differ from the PID closed loop."""
    import dataclasses

    bc = reference.base_classes
    bc.RaceCar.scan_simulator = None
    sim = bc.Simulator(PARAMS, 1, 12345, 2 * np.pi, time_step=0.01,
                       integrator=bc.Integrator.RK4)
    for car in sim.agents:
        car.speed_controller = _soft_bang_controller
    sim.set_map(MAP_YAML, ".png")
    sim.reset(START)
    ref_obs = sim.step(np.zeros((1, 2)))

    cfg = SimConfig(num_agents=1, num_beams=108, timestep=0.01,
                    integrator=Integrator.RK4, dtype="float64",
                    speed_controller=_soft_bang_controller)
    params = envlib.make_params(cfg, MAP_YAML, ".png",
                                VehicleParams.from_dict(PARAMS, jnp.float64))
    jit_step = jax.jit(lambda p, s, a: envlib.step(cfg, p, s, a))
    state, obs, *_ = envlib.reset(cfg, params, jnp.asarray(START),
                                  jax.random.PRNGKey(12345))

    # PID closed loop for the difference check
    cfg_pid = dataclasses.replace(cfg, speed_controller=None)
    jit_step_pid = jax.jit(lambda p, s, a: envlib.step(cfg_pid, p, s, a))
    state_pid, obs_pid, *_ = envlib.reset(cfg_pid, params, jnp.asarray(START),
                                          jax.random.PRNGKey(12345))

    ppp = planner_params
    diverged_from_pid = False
    # the weak controller eventually understeers into a wall (~step 250);
    # parity must hold bit-level up to that first collision — past it, the
    # iTTC freeze makes the trajectory chaotic in both sims alike
    for t in range(240):
        sp_r, st_r = pp.plan(jnp.float64(ref_obs["poses_x"][0]),
                             jnp.float64(ref_obs["poses_y"][0]),
                             jnp.float64(ref_obs["poses_theta"][0]), ppp)
        sp_o, st_o = pp.plan(obs.poses_x[0], obs.poses_y[0],
                             obs.poses_theta[0], ppp)
        sp_p, st_p = pp.plan(obs_pid.poses_x[0], obs_pid.poses_y[0],
                             obs_pid.poses_theta[0], ppp)

        ref_obs = sim.step(np.array([[float(st_r), float(sp_r)]]))
        state, obs, _, _, _ = jit_step(
            params, state, jnp.array([[st_o, sp_o]], dtype=jnp.float64))
        state_pid, obs_pid, _, _, _ = jit_step_pid(
            params, state_pid, jnp.array([[st_p, sp_p]], dtype=jnp.float64))

        err = max(abs(ref_obs["poses_x"][0] - float(obs.poses_x[0])),
                  abs(ref_obs["poses_y"][0] - float(obs.poses_y[0])),
                  abs(ref_obs["poses_theta"][0] - float(obs.poses_theta[0])))
        assert err < 1e-12, f"custom-controller parity diverged at {t}: {err}"
        if abs(float(obs.poses_x[0]) - float(obs_pid.poses_x[0])) > 1e-3:
            diverged_from_pid = True
        if float(obs.collisions[0]) > 0:
            break
    assert diverged_from_pid, \
        "custom controller produced the same trajectory as PID — seam inert?"
    bc.RaceCar.scan_simulator = None


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
