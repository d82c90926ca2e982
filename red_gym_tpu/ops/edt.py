"""Exact Euclidean distance transform on device.

The reference computes its map EDT on host with scipy at map-load time
(reference: gym/f110_gym/envs/laser_models.py:32,52 — `resolution *
edt(bitmap)`, distance from each free pixel to the nearest occupied one).
This repo's default load path uses the native C++ Felzenszwalb (with a
scipy fallback); this module adds a TPU-resident variant so procedurally
generated maps can go occupancy -> EDT -> range texture without a host
round trip.

Algorithm: the exact EDT factorizes into two 1-D min-plus passes with a
quadratic kernel (the same decomposition Felzenszwalb exploits):

    D1[r, x] = min_{y : occ[r, y]} (x - y)^2          (row pass)
    D2[r, c] = min_{r'} D1[r', c] + (r - r')^2        (column pass)
    edt      = resolution * sqrt(D2)

Felzenszwalb's lower-envelope scan is O(n) but inherently sequential; on
TPU the O(n^2) dense form is a masked broadcast + min-reduce that runs on
the VPU in a few ms for map-sized inputs and is EXACT: all squared
distances for maps up to 2896 px fit float32 integers (< 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)


@functools.partial(jax.jit, static_argnames=("chunk",))
def edt(occupancy, resolution=1.0, chunk: int = 8):
    """Distance from each nonzero (free) pixel to the nearest zero pixel.

    occupancy: (H, W), 0 = occupied/wall, nonzero = free — scipy
    `distance_transform_edt` input semantics.  Returns float32 (H, W).
    ``chunk`` bounds the (chunk, N, N) broadcast intermediate (~82 MB for
    1600-px maps at the default).
    """
    occ = jnp.asarray(occupancy) == 0                       # zero pixels
    h, w = occ.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    rs = jnp.arange(h, dtype=jnp.float32)

    def row_pass(occ_rows):                                 # (C, W) bool
        d2 = (xs[:, None] - xs[None, :]) ** 2               # (W, W)
        masked = jnp.where(occ_rows[:, None, :], d2[None], _BIG)
        return jnp.min(masked, axis=-1)                     # (C, W)

    d1 = _chunked(row_pass, occ, chunk)                     # (H, W)

    def col_pass(cols):                                     # (C, H)
        dr2 = (rs[:, None] - rs[None, :]) ** 2              # (H, H)
        return jnp.min(cols[:, None, :] + dr2[None], axis=-1)

    d2_t = _chunked(col_pass, d1.T, chunk)                  # (W, H)
    out = jnp.sqrt(d2_t.T)
    return (out * jnp.float32(resolution)).astype(jnp.float32)


def _chunked(fn, arr, chunk):
    """lax.map fn over leading-axis chunks (padding the remainder)."""
    n = arr.shape[0]
    pad = (-n) % chunk
    if pad:
        # mode="wrap" stays correct when pad > n (tiny grids): arr[:pad]
        # would under-fill and break the reshape below
        arr = jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1),
                      mode="wrap")
    stacked = arr.reshape(-1, chunk, *arr.shape[1:])
    out = jax.lax.map(fn, stacked)
    return out.reshape(-1, *out.shape[2:])[:n]
