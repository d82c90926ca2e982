"""Track map loading and the on-device map pytree.

The reference loads a ROS-style map (yaml metadata + grayscale image) inside
the scan simulator and keeps it as process-global mutable state shared by
every car and env (reference: gym/f110_gym/envs/laser_models.py:383-427,
base_classes.py:62-66).  Here a map is an explicit immutable `TrackMap`
pytree: the Euclidean distance transform is precomputed once on the host
(float64, identical to the reference pipeline) and device_put alongside the
env params, so each lidar ray march is just gathers from a device-resident
texture and different envs can carry different maps.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp
import yaml
from PIL import Image

from red_gym_tpu.native import edt


class TrackMap(NamedTuple):
    """Device-resident occupancy map data.

    All fields are arrays (pytree leaves).  ``height``/``width`` are carried
    as scalars (not Python ints) so maps of identical padded shape can be
    stacked along an env axis with differing true extents.
    """

    dt: jnp.ndarray          # (H, W) distance-to-nearest-obstacle [m]
    occupancy: jnp.ndarray   # (H, W) binarized map (0 obstacle, 255 free)
    orig_x: jnp.ndarray      # map origin x [m]
    orig_y: jnp.ndarray      # map origin y [m]
    orig_c: jnp.ndarray      # cos(origin yaw)
    orig_s: jnp.ndarray      # sin(origin yaw)
    resolution: jnp.ndarray  # [m / cell]
    height: jnp.ndarray      # true rows (<= dt.shape[0])
    width: jnp.ndarray       # true cols (<= dt.shape[1])


def load_map_image(image_path: str) -> np.ndarray:
    """Image -> binarized float64 occupancy grid, reference pipeline
    (laser_models.py:398-404): flip top-bottom, threshold at 128."""
    img = np.array(Image.open(image_path).transpose(Image.FLIP_TOP_BOTTOM))
    img = img.astype(np.float64)
    if img.ndim == 3:  # RGB(A) maps: reference relies on grayscale; take ch 0
        img = img[..., 0]
    img = np.where(img <= 128.0, 0.0, 255.0)
    return img


def load_map(map_yaml_path: str, map_ext: str = ".png", dtype=jnp.float32,
             pad_to: tuple[int, int] | None = None,
             edt_backend: str = "host") -> TrackMap:
    """Load yaml + image, compute the EDT, return a TrackMap.

    ``pad_to`` pads the dt/occupancy textures (with zeros = "at obstacle", so
    padded cells terminate rays immediately) to a common shape for multi-map
    batching; the true height/width scalars keep the bounds check exact.

    ``edt_backend``: "host" (default — native C++ Felzenszwalb with scipy
    fallback, exact f64) or "device" (ops/edt.py min-plus passes on the
    accelerator, exact f32 — lets procedurally generated occupancy grids
    stay on device; see tests/test_edt.py for parity).
    """
    with open(map_yaml_path) as f:
        meta = yaml.safe_load(f)
    resolution = float(meta["resolution"])
    origin = meta["origin"]

    image_path = os.path.splitext(map_yaml_path)[0] + map_ext
    occ = load_map_image(image_path)
    h, w = occ.shape

    if edt_backend == "device":
        from red_gym_tpu.ops import edt as edt_dev

        dt = np.asarray(edt_dev.edt(jnp.asarray(occ), resolution))
    else:
        dt = edt(occ, resolution)

    if pad_to is not None:
        ph, pw = pad_to
        if ph < h or pw < w:
            raise ValueError(f"pad_to {pad_to} smaller than map {(h, w)}")
        dt = np.pad(dt, ((0, ph - h), (0, pw - w)))
        occ = np.pad(occ, ((0, ph - h), (0, pw - w)))

    return TrackMap(
        dt=jnp.asarray(dt, dtype=dtype),
        occupancy=jnp.asarray(occ, dtype=dtype),
        orig_x=jnp.asarray(origin[0], dtype=dtype),
        orig_y=jnp.asarray(origin[1], dtype=dtype),
        orig_c=jnp.asarray(np.cos(origin[2]), dtype=dtype),
        orig_s=jnp.asarray(np.sin(origin[2]), dtype=dtype),
        resolution=jnp.asarray(resolution, dtype=dtype),
        height=jnp.asarray(h, dtype=jnp.int32),
        width=jnp.asarray(w, dtype=jnp.int32),
    )


def stack_maps(maps: Sequence[TrackMap]) -> TrackMap:
    """Stack equal-shaped TrackMaps along a leading (env-sharded) map axis."""
    return TrackMap(*[jnp.stack([getattr(m, f) for m in maps]) for f in TrackMap._fields])
