"""Pure-pursuit waypoint follower as a pure jnp policy.

Functional re-expression of the reference example planner (reference:
examples/waypoint_follow.py:15-217) so whole closed-loop rollouts stay on
device inside `lax.scan`.  The reference's sequential early-exit searches
(nearest segment, first circle intersection) become argmin/argmax reductions
over all segments — identical selections, fully batched over envs.

Reference quirks preserved:
  * the circle-intersection segment end gets +1e-6 added element-wise
    (waypoint_follow.py:66);
  * the chosen lookahead point snaps to waypoint ``i2`` (the segment start),
    not the interpolated intersection (waypoint_follow.py:195-196);
  * the target speed is read at the *nearest* segment index ``i``
    (waypoint_follow.py:197);
  * no target found -> (speed 4.0, steer 0.0) (waypoint_follow.py:211-212).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class PurePursuitParams(NamedTuple):
    waypoints: jnp.ndarray      # (N, 3) columns [x, y, speed]
    tlad: jnp.ndarray           # lookahead distance
    vgain: jnp.ndarray          # speed gain
    wheelbase: jnp.ndarray
    max_reacquire: jnp.ndarray  # 20.0 in the reference


def load_waypoints_csv(path: str, delim: str = ";", skiprows: int = 3,
                       xind: int = 1, yind: int = 2, vind: int = 5,
                       dtype=jnp.float64) -> jnp.ndarray:
    """CSV loader matching the reference conf schema
    (examples/config_example_map.yaml wpt_* fields)."""
    raw = np.loadtxt(path, delimiter=delim, skiprows=skiprows)
    return jnp.asarray(raw[:, [xind, yind, vind]], dtype=dtype)


def make_params(waypoints, tlad=0.82461887897713965, vgain=1.375,
                wheelbase=0.17145 + 0.15875, max_reacquire=20.0) -> PurePursuitParams:
    dt = waypoints.dtype
    return PurePursuitParams(
        waypoints=waypoints,
        tlad=jnp.asarray(tlad, dt), vgain=jnp.asarray(vgain, dt),
        wheelbase=jnp.asarray(wheelbase, dt),
        max_reacquire=jnp.asarray(max_reacquire, dt))


def stack_params(ppps) -> PurePursuitParams:
    """Stack per-map PurePursuitParams along a leading map axis (waypoint
    tables must share a length — the packaged generator emits a fixed 600).
    Select one map's params with ``jax.tree.map(lambda l: l[mi], stacked)``
    (see agents.ppo.pure_pursuit_opponents_multi)."""
    n = {int(p.waypoints.shape[0]) for p in ppps}
    if len(n) != 1:
        raise ValueError(f"waypoint tables differ in length: {sorted(n)}; "
                         "resample them to a common count first")
    return PurePursuitParams(*[jnp.stack([getattr(p, f) for p in ppps])
                               for f in PurePursuitParams._fields])


def nearest_point(point, traj):
    """Nearest point on the piecewise-linear trajectory
    (reference waypoint_follow.py:15-47). point (2,), traj (N, 2)."""
    diffs = traj[1:] - traj[:-1]
    l2 = diffs[:, 0] ** 2 + diffs[:, 1] ** 2
    dots = jnp.sum((point - traj[:-1]) * diffs, axis=1)
    t = jnp.clip(dots / l2, 0.0, 1.0)
    proj = traj[:-1] + t[:, None] * diffs
    dists = jnp.linalg.norm(point - proj, axis=1)
    i = jnp.argmin(dists)
    return proj[i], dists[i], t[i], i


def first_intersection(point, radius, traj, t0):
    """First circle/trajectory intersection walking forward from parameter t0
    with wrap-around (reference waypoint_follow.py:49-131, wrap=True).

    Returns (found, i2) where i2 indexes the segment start (may be N-1 for
    the wrap segment, mirroring the reference's -1)."""
    n = traj.shape[0]
    start_i = jnp.floor(t0).astype(jnp.int32)
    start_t = jnp.mod(t0, 1.0)

    starts = traj[:-1]
    ends = traj[1:] + 1e-6
    v = ends - starts
    a = jnp.sum(v * v, axis=1)
    b = 2.0 * jnp.sum(v * (starts - point), axis=1)
    c = (jnp.sum(starts * starts, axis=1) + jnp.sum(point * point)
         - 2.0 * jnp.sum(starts * point, axis=1) - radius * radius)
    disc = b * b - 4 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)

    in01_1 = ok & (t1 >= 0.0) & (t1 <= 1.0)
    in01_2 = ok & (t2 >= 0.0) & (t2 <= 1.0)

    seg = jnp.arange(n - 1)
    is_start_seg = seg == start_i
    acc1 = in01_1 & jnp.where(is_start_seg, t1 >= start_t, True)
    acc2 = in01_2 & jnp.where(is_start_seg, t2 >= start_t, True)
    accept_fwd = (acc1 | acc2) & (seg >= start_i)

    big = n + 10
    order_fwd = jnp.where(accept_fwd, seg, big)
    i_fwd = jnp.min(order_fwd)
    found_fwd = i_fwd < big

    # wrap pass: segments -1, 0, .., start_i-1 (no start_t filter).
    # segment -1 = (traj[-1], traj[0]); its quadratic:
    sw = traj[-1]
    ew = traj[0] + 1e-6
    vw = ew - sw
    aw = jnp.sum(vw * vw)
    bw = 2.0 * jnp.sum(vw * (sw - point))
    cw = (jnp.sum(sw * sw) + jnp.sum(point * point)
          - 2.0 * jnp.sum(sw * point) - radius * radius)
    dw = bw * bw - 4 * aw * cw
    okw = dw >= 0
    sqw = jnp.sqrt(jnp.where(okw, dw, 0.0))
    t1w = (-bw - sqw) / (2 * aw)
    t2w = (-bw + sqw) / (2 * aw)
    accw = okw & (((t1w >= 0.0) & (t1w <= 1.0)) | ((t2w >= 0.0) & (t2w <= 1.0)))

    accept_wrap = (in01_1 | in01_2) & (seg < start_i)
    order_wrap = jnp.where(accept_wrap, seg, big)
    i_wrap_pos = jnp.min(order_wrap)
    found_wrap_pos = i_wrap_pos < big

    # priority: forward pass; then wrap segment -1; then wrapped 0..start_i-1
    i2 = jnp.where(found_fwd, i_fwd,
                   jnp.where(accw, n - 1,
                             jnp.where(found_wrap_pos, i_wrap_pos, 0)))
    found = found_fwd | accw | found_wrap_pos
    return found, i2


def plan(pose_x, pose_y, pose_theta, pp: PurePursuitParams):
    """(speed, steer) actuation (reference waypoint_follow.py:133-217)."""
    point = jnp.stack([pose_x, pose_y])
    traj = pp.waypoints[:, 0:2]
    _, nearest_dist, t, i = nearest_point(point, traj)

    found, i2 = first_intersection(point, pp.tlad, traj, i + t)

    speed_i = pp.waypoints[i, 2]
    wp_inter = jnp.stack([traj[i2, 0], traj[i2, 1], speed_i])
    wp_near = jnp.stack([traj[i, 0], traj[i, 1], speed_i])

    use_inter = nearest_dist < pp.tlad
    use_near = (~use_inter) & (nearest_dist < pp.max_reacquire)
    have_wp = (use_inter & found) | use_near
    wp = jnp.where(use_inter, wp_inter, wp_near)

    # get_actuation (waypoint_follow.py:133-144)
    way_y = (jnp.sin(-pose_theta) * (wp[0] - point[0])
             + jnp.cos(-pose_theta) * (wp[1] - point[1]))
    radius_inv = 2.0 * way_y / (pp.tlad ** 2)
    steer = jnp.where(jnp.abs(way_y) < 1e-6, 0.0,
                      jnp.arctan(pp.wheelbase * radius_inv))
    speed = pp.vgain * wp[2]

    speed = jnp.where(have_wp, speed, 4.0)
    steer = jnp.where(have_wp, steer, 0.0)
    return speed, steer


class FlippyPlanner:
    """Adversarial integrator probe (reference waypoint_follow.py:220-238):
    alternates full steer every `flip_every` steps at constant speed."""

    def __init__(self, speed=1.0, flip_every=1, steer=2.0):
        self.speed, self.flip_every, self.steer0 = speed, flip_every, steer

    def plan_step(self, step_idx):
        sign = jnp.where((step_idx // self.flip_every) % 2 == 0, -1.0, 1.0)
        return jnp.asarray(self.speed), sign * self.steer0
