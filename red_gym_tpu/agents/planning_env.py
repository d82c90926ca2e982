"""High-level path-planning environment: the SACF110Env equivalent.

The reference wraps F110Env so the RL action is a 16-D vector decoded into 8
angle-clamped unit path segments, tracked by a low-level MPC, with bitmap-
derived rewards (reference: src/SAL.py:30-269).  Here the whole pipeline —
action decode, spline/QP MPC, env step, rasterization and rewards — is a
single pure jitted function over a `PlanState` pytree, vmappable over envs.

Faithful semantic notes:
  * the reference's MPC_controller simulates 10 internal steps but only
    u[0] is applied (SAL.py:183-217); u[0] depends only on the first QP
    solve, so we solve with total_steps=1 — identical output, 10x cheaper;
  * path replan fires when the path index reaches the end of the 8-point
    path or at the first step (SAL.py:108-110);
  * rewards: progress*10, bitmap-collision -100, centerline*2, lap bonus
    (SAL.py:219-250).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.env import EnvParams, EnvState, Observation, reset, step
from red_gym_tpu.agents import mpc
from red_gym_tpu.ops import bitmap_rewards as br
from red_gym_tpu.ops.rasterize import lidar_to_bitmap

NUM_SEGMENTS = 8
ACTION_DIM = 16           # reshaped (8, 2) like the reference decode
PATH_LEN = NUM_SEGMENTS   # decoded path points


class PlanConfig(NamedTuple):
    car_length: jnp.ndarray          # 0.3 (SAL.py:56)
    vector_length: jnp.ndarray       # 0.5
    dist_threshold: jnp.ndarray      # 0.2 waypoint reach radius
    max_angle_diff_deg: jnp.ndarray  # 10.0
    map_scale: jnp.ndarray           # 10 px/m (SAL.py:66)
    bitmap_dims: tuple = (256, 256)


def default_plan_config(dtype=jnp.float32) -> PlanConfig:
    return PlanConfig(
        car_length=jnp.asarray(0.3, dtype),
        vector_length=jnp.asarray(0.5, dtype),
        dist_threshold=jnp.asarray(0.2, dtype),
        max_angle_diff_deg=jnp.asarray(10.0, dtype),
        map_scale=jnp.asarray(10.0, dtype),
    )


class PlanState(NamedTuple):
    env_state: EnvState
    obs: Observation
    bitmap: jnp.ndarray      # (256, 256) uint8 FILL bitmap of last scan
    path: jnp.ndarray        # (PATH_LEN, 2) world-frame waypoints
    sub_index: jnp.ndarray   # int32 current waypoint pointer
    prev_pos: jnp.ndarray    # (2,) position at last step


def decode_action(raw_action, pcfg: PlanConfig):
    """16-D action -> 8 angle-clamped unit vectors
    (reference compute_vectors_with_angle_clamp, SAL.py:585-608)."""
    v = raw_action.reshape(NUM_SEGMENTS, 2)
    v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-8)
    max_diff = jnp.deg2rad(pcfg.max_angle_diff_deg)

    def clamp_step(prev_angle, vec):
        desired = jnp.arctan2(vec[1], vec[0])
        diff = jnp.mod(desired - prev_angle + jnp.pi, 2 * jnp.pi) - jnp.pi
        ang = prev_angle + jnp.clip(diff, -max_diff, max_diff)
        return ang, jnp.stack([jnp.cos(ang), jnp.sin(ang)])

    _, clamped = jax.lax.scan(clamp_step, jnp.asarray(0.0, v.dtype), v[1:])
    first = jnp.asarray([1.0, 0.0], v.dtype)
    return jnp.concatenate([first[None], clamped], axis=0)


def build_path(increments, car_pose, pcfg: PlanConfig):
    """Local increments -> global path starting at the car nose
    (reference _calculate_global_path, SAL.py:157-181)."""
    x, y, th = car_pose[0], car_pose[1], car_pose[2]
    c, s = jnp.cos(th), jnp.sin(th)
    front = jnp.stack([x + pcfg.car_length * c, y + pcfg.car_length * s])
    d = increments * pcfg.vector_length
    gdx = d[:, 0] * c - d[:, 1] * s
    gdy = d[:, 0] * s + d[:, 1] * c
    steps = jnp.stack([gdx, gdy], axis=1)
    return front[None, :] + jnp.cumsum(steps, axis=0)


def _world_to_pixel(x, y, pcfg: PlanConfig):
    px = jnp.clip((128 + x * pcfg.map_scale).astype(jnp.int32), 0, 255)
    py = jnp.clip((128 + y * pcfg.map_scale).astype(jnp.int32), 0, 255)
    return px, py


class PlanningEnv:
    """Functional SACF110Env: step(plan_state, raw_action) -> (state', bitmap,
    reward, done, info)."""

    def __init__(self, cfg: SimConfig, env_params: EnvParams,
                 pcfg: PlanConfig | None = None,
                 mcfg: mpc.MPCConfig | None = None,
                 reward_mode: str = "sal"):
        """``reward_mode``:

        * "sal"   — reference-faithful (default): collision/centering are
          probed at _world_to_pixel of the ABSOLUTE pose, reproducing the
          reference's world-coord-as-pixel quirk (SAL.py:229-243) — the
          probe leaves the bitmap's black center square as soon as the car
          is ~0.2 m from the world origin, after which the -100 collision
          penalty fires almost every step.
        * "fixed" — the same reward terms with physically-meaningful
          probes: collision = the env's actual collision flag (iTTC/body),
          centering evaluated at the car's true position in its own lidar
          bitmap (the center).  Use for training that needs a sane signal.
        """
        if reward_mode not in ("sal", "fixed"):
            raise ValueError(f"reward_mode must be 'sal'|'fixed', got "
                             f"{reward_mode!r}")
        self.cfg = cfg
        self.env_params = env_params
        self.pcfg = pcfg or default_plan_config(cfg.jdtype)
        self.mcfg = mcfg or mpc.default_mpc_config(cfg.jdtype)
        self.reward_mode = reward_mode

    def _bitmap(self, scan):
        return lidar_to_bitmap(scan, bg_color="black", draw_mode="FILL",
                               output_image_dims=self.pcfg.bitmap_dims)

    def reset(self, pose, key) -> PlanState:
        """Default pose like the reference (SAL.py:69-89)."""
        env_state, obs, *_ = reset(self.cfg, self.env_params, pose, key)
        bitmap = self._bitmap(obs.scans[self.cfg.ego_idx if obs.scans.ndim > 2
                                        else 0])
        ego = self.cfg.ego_idx
        return PlanState(
            env_state=env_state, obs=obs,
            bitmap=self._bitmap(obs.scans[ego]),
            path=jnp.zeros((PATH_LEN, 2), self.cfg.jdtype),
            sub_index=jnp.asarray(PATH_LEN, jnp.int32),  # force replan
            prev_pos=jnp.stack([obs.poses_x[ego], obs.poses_y[ego]]),
        )

    def step(self, ps: PlanState, raw_action):
        cfg, pcfg, mcfg = self.cfg, self.pcfg, self.mcfg
        ego = cfg.ego_idx
        car_pose = jnp.stack([ps.obs.poses_x[ego], ps.obs.poses_y[ego],
                              ps.obs.poses_theta[ego]])

        # replan when the path is exhausted (SAL.py:108-110)
        need = ps.sub_index >= PATH_LEN
        new_path = build_path(decode_action(raw_action, pcfg), car_pose, pcfg)
        path = jnp.where(need, new_path, ps.path)
        sub_index = jnp.where(need, 0, ps.sub_index)

        # low-level MPC on the current path (u[0] only; see module note)
        u = mpc.mpc_controller(
            path, mcfg.desired_velocity, mcfg.timestep, mcfg.Q, mcfg.R,
            mcfg.Qf, total_steps=1, horizon=mcfg.horizon,
            current_vel_x=ps.obs.linear_vels_x[ego],
            current_vel_y=ps.obs.linear_vels_y[ego])[0]
        speed = jnp.hypot(ps.obs.linear_vels_x[ego], ps.obs.linear_vels_y[ego])
        ctrl = mpc.mpc_converter(u[0], u[1], speed, jnp.asarray(0.0, u.dtype),
                                 0.4189, 3.0, 8.0, -4.0)

        actions = jnp.zeros((cfg.num_agents, 2), cfg.jdtype)
        actions = actions.at[ego].set(ctrl.astype(cfg.jdtype))
        env_state, obs, _, done, info = step(cfg, self.env_params,
                                             ps.env_state, actions)
        bitmap = self._bitmap(obs.scans[ego])

        # divergence quarantine: the CommonRoad ST model is stiff near the
        # kinematic-switch speed, and an adversarial planner CAN excite the
        # yaw/slip feedback into overflow at the reference's own dt=0.015
        # (observed: |yaw_rate| 1e35 within one episode of random-policy
        # warmup).  The reference's one-env host loop would crash there;
        # batched training must instead flag the env done (the trainer's
        # auto-reset restarts it) BEFORE a huge/NaN reward poisons the
        # replay buffer.  Same philosophy as utils.debug.quarantine_reset.
        xs = env_state.x.reshape(-1)
        diverged = (~jnp.all(jnp.isfinite(xs))) | (jnp.max(jnp.abs(xs)) > 1e4)
        done = done | diverged

        # rewards (SAL.py:219-250) — computed on the PREVIOUS bitmap
        new_pos = jnp.stack([obs.poses_x[ego], obs.poses_y[ego]])
        progress = jnp.linalg.norm(new_pos - ps.prev_pos) * 10.0
        if self.reward_mode == "sal":
            px, py = _world_to_pixel(obs.poses_x[ego], obs.poses_y[ego], pcfg)
            collided = br.detect_collision(ps.bitmap, px, py)
            centering = br.centerline_reward(
                ps.bitmap, obs.poses_x[ego].astype(jnp.int32),
                obs.poses_y[ego].astype(jnp.int32)) * 2.0
        else:  # "fixed": env-true collision, car-frame centering probe
            collided = obs.collisions[ego] > 0
            h, w = pcfg.bitmap_dims
            # probe one row above the drawn +-2px black car marker (the
            # marker itself breaks the white run at the exact center)
            centering = br.centerline_reward(
                ps.bitmap, jnp.asarray(w // 2, jnp.int32),
                jnp.asarray(h // 2 - 3, jnp.int32)) * 2.0
        lap_bonus = jnp.where(obs.lap_counts[ego] > ps.obs.lap_counts[ego],
                              500.0 - 10.0 * obs.lap_times[ego], 0.0)
        reward = (progress + centering + lap_bonus
                  + jnp.where(collided, -100.0, 0.0))
        # a diverged step's reward is crash-valued, never the (huge/NaN)
        # computed one
        reward = jnp.where(diverged, -100.0, reward)

        # waypoint index advance (SAL.py:252-259)
        target = path[jnp.clip(sub_index, 0, PATH_LEN - 1)]
        reached = jnp.linalg.norm(new_pos - target) < pcfg.dist_threshold
        sub_index = sub_index + reached.astype(jnp.int32)

        new_ps = PlanState(env_state=env_state, obs=obs, bitmap=bitmap,
                           path=path, sub_index=sub_index, prev_pos=new_pos)
        return new_ps, bitmap, reward.astype(jnp.float32), done, info
