"""Lidar-scan -> occupancy-bitmap rasterization, fully on device.

The reference rasterizes with cv2 on host (reference:
weap_util/weap_util/lidar.py:4-155, src/bitmap.py, src/SAL.py:274-385 — three
near-copies with different defaults).  Here the rasterizer is pure jnp so the
bitmap observation pipeline stays inside the jitted step: polygon fill is a
crossing-number test evaluated for all pixels x edges in one broadcast, and
line drawing is fixed-count sampling + scatter-max.  Shapes are static
(pixels x beams), so the op vmaps over (env, agent) and fuses with the scan.

Pixel-level note: cv2's scanline rasterizer and this one can disagree on a
thin band of boundary pixels; tests pin IoU > 0.97 against cv2 rather than
bit-equality.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def beam_endpoints(scan, num_beams_out: int, out_dims, scaling_factor,
                   starting_angle=-math.pi / 2, fov=2 * math.pi,
                   winding_dir="CCW"):
    """Downsample the scan and convert to integer pixel endpoints, matching
    the reference's index/rounding pipeline (weap_util/lidar.py:70-83)."""
    n = scan.shape[-1]
    idx = np.linspace(0, n - 1, num_beams_out).astype(int)  # static gather
    data = scan[..., idx]
    direction = 1.0 if winding_dir == "CCW" else -1.0
    angles = starting_angle + direction * fov * np.linspace(0, 1, num_beams_out)
    angles = jnp.asarray(angles, dtype=scan.dtype)
    cy, cx = out_dims[0] // 2, out_dims[1] // 2
    px = jnp.rint(cy + scaling_factor * data * jnp.cos(angles)).astype(jnp.int32)
    py = jnp.rint(cx + scaling_factor * data * jnp.sin(angles)).astype(jnp.int32)
    return jnp.stack([px, py], axis=-1)  # (..., K, 2) in cv2 (x, y) order


def _fill_polygon(points, out_dims):
    """Interior+boundary mask of the closed polygon ``points`` (K, 2)."""
    h, w = out_dims
    xs = points[..., 0].astype(jnp.float32)
    ys = points[..., 1].astype(jnp.float32)
    x2 = jnp.roll(xs, -1, axis=-1)
    y2 = jnp.roll(ys, -1, axis=-1)

    pxg = jnp.arange(w, dtype=jnp.float32)[None, :, None]   # (1, W, K)
    pyg = jnp.arange(h, dtype=jnp.float32)[:, None, None]   # (H, 1, K)

    y1 = ys[None, None, :]
    y2b = y2[None, None, :]
    x1 = xs[None, None, :]
    x2b = x2[None, None, :]

    cond = (y1 > pyg) != (y2b > pyg)
    denom = jnp.where(y2b == y1, 1.0, y2b - y1)
    x_int = (x2b - x1) * (pyg - y1) / denom + x1
    crossing = cond & (pxg < x_int)
    inside = (jnp.sum(crossing, axis=-1) % 2) == 1           # (H, W)
    return inside | _polyline(points, out_dims, closed=True)


def _draw_segments(starts, ends, out_dims, samples: int = 448):
    """Pixel mask of line segments via dense fixed-count sampling.

    448 samples covers every gap for segments up to ~2x the 256-px canvas
    diagonal, which bounds all lidar-bitmap geometry."""
    h, w = out_dims
    t = jnp.linspace(0.0, 1.0, samples, dtype=jnp.float32)
    pts = (starts[..., None, :].astype(jnp.float32) * (1 - t)[:, None]
           + ends[..., None, :].astype(jnp.float32) * t[:, None])
    pix = jnp.rint(pts).astype(jnp.int32)                    # (..., S, 2)
    x = jnp.clip(pix[..., 0], 0, w - 1)
    y = jnp.clip(pix[..., 1], 0, h - 1)
    flat = (y * w + x).reshape(-1)
    img = jnp.zeros((h * w,), dtype=bool).at[flat].set(True)
    return img.reshape(h, w)


def _polyline(points, out_dims, closed=True):
    ends = jnp.roll(points, -1, axis=-2) if closed else points[1:]
    starts = points if closed else points[:-1]
    return _draw_segments(starts, ends, out_dims)


def _rays(points, out_dims):
    h, w = out_dims
    center = jnp.array([h // 2, w // 2], dtype=points.dtype)
    starts = jnp.broadcast_to(center, points.shape)
    lines = _draw_segments(starts, points, out_dims)
    # 5x5 endpoint squares (reference cv2.rectangle(p-2, p+2, ..., -1))
    dy, dx = jnp.meshgrid(jnp.arange(-2, 3), jnp.arange(-2, 3), indexing="ij")
    sq_x = jnp.clip(points[..., None, 0] + dx.reshape(-1), 0, w - 1)
    sq_y = jnp.clip(points[..., None, 1] + dy.reshape(-1), 0, h - 1)
    flat = (sq_y * w + sq_x).reshape(-1)
    squares = jnp.zeros((h * w,), dtype=bool).at[flat].set(True).reshape(h, w)
    return lines | squares


@partial(jax.jit, static_argnames=("winding_dir", "starting_angle", "bg_color",
                                   "draw_center", "output_image_dims",
                                   "target_beam_count", "fov", "draw_mode",
                                   "channels", "max_scan_radius",
                                   "scaling_factor"))
def lidar_to_bitmap(scan, winding_dir: str = "CCW",
                    starting_angle: float = -math.pi / 2,
                    max_scan_radius: float | None = None,
                    scaling_factor: float | None = 10.0,
                    bg_color: str = "white", draw_center: bool = True,
                    output_image_dims: tuple = (256, 256),
                    target_beam_count: int = 600, fov: float = 2 * math.pi,
                    draw_mode: str = "FILL", channels: int = 1):
    """uint8 bitmap of a lidar scan (reference weap_util/lidar.py:99-155).

    draw_mode: 'FILL' | 'POLYGON' | 'RAYS'; channels: 1 | 3 | 4.
    """
    assert winding_dir in ("CW", "CCW")
    assert bg_color in ("black", "white")
    assert draw_mode in ("RAYS", "POLYGON", "FILL")
    assert channels in (1, 3, 4)

    if max_scan_radius is not None:
        scaling_factor = min(output_image_dims) / max_scan_radius
    elif scaling_factor is None:
        raise ValueError("provide either max_scan_radius or scaling_factor")

    bg, fg = (0, 255) if bg_color == "black" else (255, 0)
    points = beam_endpoints(scan, target_beam_count, output_image_dims,
                            scaling_factor, starting_angle, fov, winding_dir)

    if draw_mode == "FILL":
        mask = _fill_polygon(points, output_image_dims)
    elif draw_mode == "POLYGON":
        mask = _polyline(points, output_image_dims, closed=True)
    else:
        mask = _rays(points, output_image_dims)

    img = jnp.where(mask, jnp.uint8(fg), jnp.uint8(bg))

    if draw_center:
        h, w = output_image_dims
        cy, cx = h // 2, w // 2
        center_color = jnp.uint8(bg if draw_mode == "FILL" else fg)
        img = img.at[cy - 2:cy + 3, cx - 2:cx + 3].set(center_color)

    if channels == 1:
        return img
    if channels == 3:
        return jnp.stack([img] * 3, axis=-1)
    alpha = jnp.full_like(img, 255)
    return jnp.stack([img, img, img, alpha], axis=-1)


def scans_to_legacy_tensors(scans, max_range: float = 30.0,
                            grid_size: int = 256,
                            bound: float = 10.0) -> np.ndarray:
    """Reference dataset-collector tensor layout, vectorized.

    The reference collector scatters each beam's hit point into a
    ``(grid_size, grid_size)`` uint8 occupancy tensor — beam angles fixed at
    linspace(-135 deg, 135 deg) regardless of the env fov, x forward mapped
    to ROWS, beams at/after ``max_range`` or outside the +-``bound`` m box
    skipped, plain int() truncation of the pixel coordinate — and saves a
    batch of them under the single npz key ``data`` (reference:
    f1tenth_gym/examples/lidar.py:214-244, np.savez_compressed at 255-257).
    This reproduces those semantics bit-for-bit for an (N, B) batch of
    scans so offline pipelines written against the reference's 448 shipped
    datasets consume our collector's output unchanged.
    """
    scans = np.asarray(scans, np.float64)
    n, b = scans.shape
    angles = np.linspace(-135.0, 135.0, b) * np.pi / 180.0
    x = scans * np.cos(angles)
    y = scans * np.sin(angles)
    keep = ((scans < max_range)
            & (x >= -bound) & (x <= bound) & (y >= -bound) & (y <= bound))
    span = 2.0 * bound
    # int() truncation (values are >= 0 here, so trunc == floor) then the
    # reference's redundant clip
    i_row = np.clip(((x + bound) / span * (grid_size - 1)).astype(np.int64),
                    0, grid_size - 1)
    i_col = np.clip(((y + bound) / span * (grid_size - 1)).astype(np.int64),
                    0, grid_size - 1)
    out = np.zeros((n, grid_size, grid_size), np.uint8)
    n_idx = np.broadcast_to(np.arange(n)[:, None], (n, b))
    out[n_idx[keep], i_row[keep], i_col[keep]] = 1
    return out
