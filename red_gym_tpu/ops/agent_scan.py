"""Scan post-processing against other agents: iTTC and opponent ray casting.

Reference: gym/f110_gym/envs/laser_models.py:188-346.  The reference narrows
the opponent ray cast to an argmin-derived index window and mutates the scan
in place per opponent; here every beam x edge intersection is computed in one
fused broadcast and the window becomes a mask, which keeps shapes static and
the whole thing vmappable over (env, agent, opponent).  Results are
beam-for-beam identical because min-accumulation over opponents is
order-independent.
"""

from __future__ import annotations

import jax.numpy as jnp

from red_gym_tpu.ops.scan import ScanTables


def check_ttc(scan, vel, tables: ScanTables, ttc_thresh):
    """Instantaneous time-to-collision wall check.

    Vectorized min-reduce form of reference check_ttc_jit
    (laser_models.py:188-217): collision iff any beam's
    (range - side_distance) / (v * cos(angle)) lands in [0, thresh).
    scan (..., B), vel (...) -> bool (...).
    """
    proj_vel = vel[..., None] * tables.beam_cosines
    ttc = (scan - tables.side_distances) / proj_vel
    hit = (ttc < ttc_thresh) & (ttc >= 0.0)
    return jnp.any(hit, axis=-1) & (vel != 0.0)


def _wrap_pi(a):
    """Wrap to (-pi, pi] with the reference's single-correction form
    (laser_models.py:304-307)."""
    a = jnp.where(a > jnp.pi, a - 2 * jnp.pi, a)
    a = jnp.where(a < -jnp.pi, a + 2 * jnp.pi, a)
    return a


def get_range(pose, beam_theta, va, vb):
    """Distance from pose along world angle beam_theta to segment va->vb.

    Branch-free form of reference get_range (laser_models.py:250-280),
    including the collinear fallback.  All args broadcast.
    """
    o = pose[..., 0:2]
    v1 = o - va
    v2 = vb - va
    v3 = jnp.stack([jnp.cos(beam_theta + jnp.pi / 2.0),
                    jnp.sin(beam_theta + jnp.pi / 2.0)], axis=-1)

    denom = jnp.sum(v2 * v3, axis=-1)
    d1 = (v2[..., 0] * v1[..., 1] - v2[..., 1] * v1[..., 0]) / denom
    d2 = jnp.sum(v1 * v3, axis=-1) / denom
    valid = (jnp.abs(denom) > 0.0) & (d1 >= 0.0) & (d2 >= 0.0) & (d2 <= 1.0)

    # collinear fallback (only reachable when denom == 0)
    ba = vb - va
    ca = va - o
    cross = ba[..., 0] * ca[..., 1] - ba[..., 1] * ca[..., 0]
    collinear = (jnp.abs(denom) <= 0.0) & (jnp.abs(cross) < 1e-8)
    d_col = jnp.minimum(jnp.linalg.norm(va - o, axis=-1),
                        jnp.linalg.norm(vb - o, axis=-1))

    inf = jnp.asarray(jnp.inf, d1.dtype)
    return jnp.where(valid, d1, jnp.where(collinear, d_col, inf))


def blocked_view_mask(pose, vertices, tables: ScanTables):
    """Beam mask [min_ind, max_ind] blocked by an opponent body.

    Vectorized reference get_blocked_view_indices (laser_models.py:283-315):
    the four pose->vertex bearings are snapped to the nearest beam via argmin
    and the min..max index range becomes a boolean mask over beams.
    pose (..., 3), vertices (..., 4, 2) -> bool (..., B).
    """
    vecs = vertices - pose[..., None, 0:2]
    unit_angle = jnp.arctan2(vecs[..., 1], vecs[..., 0])          # (..., 4)
    ego_angle = jnp.arctan2(jnp.sin(pose[..., 2]), jnp.cos(pose[..., 2]))
    rel = _wrap_pi(ego_angle[..., None] - unit_angle)
    bearings = -rel                                               # (..., 4)

    diff = jnp.abs(tables.scan_angles - bearings[..., None])      # (..., 4, B)
    inds = jnp.argmin(diff, axis=-1)                              # (..., 4)
    lo = jnp.min(inds, axis=-1)[..., None]
    hi = jnp.max(inds, axis=-1)[..., None]
    beam_idx = jnp.arange(tables.scan_angles.shape[0])
    return (beam_idx >= lo) & (beam_idx <= hi)


def ray_cast_opponent(pose, scan, vertices, tables: ScanTables):
    """Shorten scan beams blocked by one opponent rectangle.

    Reference ray_cast (laser_models.py:319-346): within the blocked window,
    each beam takes the min over its current range and the 4 edge
    intersections.  pose (..., 3), scan (..., B), vertices (..., 4, 2).
    """
    mask = blocked_view_mask(pose, vertices, tables)

    va = vertices                                   # (..., 4, 2)
    vb = jnp.roll(vertices, -1, axis=-2)
    beam_theta = pose[..., 2:3] + tables.scan_angles            # (..., B)
    ranges = get_range(pose[..., None, None, :],
                       beam_theta[..., None, :],                 # (..., 1, B)
                       va[..., :, None, :], vb[..., :, None, :])  # (..., 4, B)
    nearest = jnp.min(ranges, axis=-2)                           # (..., B)
    return jnp.where(mask, jnp.minimum(scan, nearest), scan)


def ray_cast_all_opponents(poses, scans, all_vertices, tables: ScanTables):
    """Apply opponent ray casting for every agent against every other agent.

    poses (A, 3), scans (A, B), all_vertices (A, 4, 2) -> (A, B).
    Equivalent to the reference's sequential per-opponent loop
    (base_classes.py:204-225) because min-accumulation commutes.
    """
    if poses.shape[0] == 1:
        return scans
    return _pairwise(poses, scans, all_vertices, tables)


def _pairwise(poses, scans, all_vertices, tables: ScanTables):
    num_agents = poses.shape[0]
    # i = scanning agent axis, j = opponent axis.  Size-1 axes (not
    # broadcast_to) so per-beam trig inside get_range evaluates at (A, 1, B)
    # — values identical, A-fold less transcendental work.
    pose_i = poses[:, None, :]                       # (A, 1, 3)
    scan_i = scans[:, None, :]                       # (A, 1, B)
    verts_j = all_vertices[None, :, :, :]            # (1, A, 4, 2)
    cut = ray_cast_opponent(pose_i, scan_i, verts_j, tables)  # (A, A, B)
    eye = jnp.eye(num_agents, dtype=bool)[:, :, None]
    cut = jnp.where(eye, jnp.inf, cut)               # ignore self
    return jnp.minimum(scans, jnp.min(cut, axis=1))
