"""Bitmap-based reward helpers for the SAL training stack, in jnp.

Re-expression of the reference's cv2/numpy reward utilities
(reference: src/SAL.py:766-935): pixel-neighborhood collision test,
Sobel-gradient wall normals, collision-angle penalty, and row-scan
centerline distance/reward.  All are pure, fixed-shape and vmappable so the
reward pipeline fuses into the jitted env step.

Deviation note: the reference gates wall-normal estimation on cv2.Canny
edges; here edge pixels are gradient-magnitude-thresholded Sobel responses
(no hysteresis), which selects the same wall boundaries on binary bitmaps.
"""

from __future__ import annotations

import jax.numpy as jnp


def detect_collision(fill_bitmap, car_x, car_y, neighborhood: int = 1):
    """True if any white (255) pixel neighbors (car_x, car_y)
    (reference detect_collison, SAL.py:766-790; center pixel excluded)."""
    h, w = fill_bitmap.shape[-2:]
    offs = jnp.arange(-neighborhood, neighborhood + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    keep = ~((dx == 0) & (dy == 0))
    nx = car_x + dx
    ny = car_y + dy
    inb = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
    vals = fill_bitmap[jnp.clip(ny, 0, h - 1), jnp.clip(nx, 0, w - 1)]
    return jnp.any(keep & inb & (vals == 255))


def _sobel(img):
    f = img.astype(jnp.float32)
    p = jnp.pad(f, 1, mode="edge")
    gx = (p[0:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
          - p[0:-2, 0:-2] - 2 * p[1:-1, 0:-2] - p[2:, 0:-2])
    gy = (p[2:, 0:-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
          - p[0:-2, 0:-2] - 2 * p[0:-2, 1:-1] - p[0:-2, 2:])
    return gx, gy


def get_wall_normal(fill_bitmap, car_x, car_y, region: int = 10,
                    edge_thresh: float = 200.0):
    """Mean unit gradient at wall-edge pixels near the car
    (reference get_wall_normal, SAL.py:793-841)."""
    h, w = fill_bitmap.shape[-2:]
    gx, gy = _sobel(fill_bitmap)
    mag = jnp.abs(gx) + jnp.abs(gy)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_region = ((xs >= car_x - region) & (xs <= car_x + region)
                 & (ys >= car_y - region) & (ys <= car_y + region))
    edge = (mag > edge_thresh) & in_region

    n = jnp.sum(edge)
    mean_gx = jnp.sum(jnp.where(edge, gx, 0.0)) / jnp.maximum(n, 1)
    mean_gy = jnp.sum(jnp.where(edge, gy, 0.0)) / jnp.maximum(n, 1)
    norm = jnp.sqrt(mean_gx**2 + mean_gy**2) + 1e-8
    return jnp.where(n > 0,
                     jnp.stack([mean_gx, mean_gy]) / norm,
                     jnp.zeros(2))


def compute_collision_angle(wall_normal, car_direction=jnp.array([0.0, 1.0])):
    """Angle in degrees between direction and wall normal
    (reference SAL.py:844-856)."""
    dot = jnp.clip(jnp.dot(car_direction, wall_normal), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(dot))


def collision_angle_penalty(fill_bitmap, car_x, car_y):
    """0 if no collision, else an angle-scaled penalty in [-1, -0.1]
    (reference SAL.py:858-877)."""
    collided = detect_collision(fill_bitmap, car_x, car_y)
    normal = get_wall_normal(fill_bitmap, car_x, car_y)
    angle = compute_collision_angle(normal)
    penalty = -jnp.interp(jnp.abs(angle), jnp.array([0.0, 90.0]),
                          jnp.array([0.1, 1.0]))
    return jnp.where(collided, penalty, 0.0)


def distance_from_row_center(fill_bitmap, car_x, car_y):
    """Distance from the center of the drivable (white) run containing the
    car on its pixel row, or -1 if invalid (the reference returns None;
    SAL.py:879-919)."""
    h, w = fill_bitmap.shape[-2:]
    row = fill_bitmap[jnp.clip(car_y, 0, h - 1)]
    white = row == 255
    idx = jnp.arange(w)

    left_block = jnp.max(jnp.where(~white & (idx <= car_x), idx, -1))
    right_block = jnp.min(jnp.where(~white & (idx >= car_x), idx, w))
    left_edge = left_block + 1
    right_edge = right_block - 1

    mid = (left_edge + right_edge) / 2.0
    dist = jnp.abs(car_x - mid)
    valid = ((car_x >= 0) & (car_x < w) & (car_y >= 0) & (car_y < h)
             & (left_edge >= 0) & (right_edge < w) & (left_edge < right_edge))
    return jnp.where(valid, dist, -1.0)


def centerline_reward(fill_bitmap, car_x, car_y, max_lane_halfwidth: float = 50.0):
    """1 at lane center decaying to 0 at the boundary; -1 when off-track
    (reference SAL.py:921-935)."""
    dist = distance_from_row_center(fill_bitmap, car_x, car_y)
    reward = jnp.maximum(0.0, 1.0 - dist / max_lane_halfwidth)
    return jnp.where(dist < 0, -1.0, reward)
