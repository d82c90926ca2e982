"""Pallas TPU kernel for the fast-scan epilogue: shuffle-matmul + 3-tap blend.

The last stage of trace_fast_mxu is ``g = spec_r @ gmat`` (the packed
inverse-DFT fused with the one-hot beam shuffle, producing three shifted
copies g0/g1/g2 of every beam) followed by an elementwise 3-tap linear
interpolation.  In plain XLA the (rows, 3*beams) intermediate ``g`` is
materialized to HBM and re-read by the blend — ~425 MB per step at 16k
2-agent envs.  This kernel fuses the matmul with its epilogue: per grid
tile, one MXU pass per shifted copy out of VMEM, then the blend/mask/clip in
registers, writing only the final (rows, beams) scan.

The kernel is row-parallel with no cross-row interaction, so a
``custom_vmap`` rule collapses any leading batch axes into the row dimension
instead of letting vmap lift the grid (a vmapped pallas_call would otherwise
run one tiny 2-row matmul per env).

Grid layout: (beam_tiles, row_tiles) with the beam index OUTER, so the three
gmat tiles stay resident in VMEM across the whole row sweep (Mosaic skips
re-fetching blocks whose index map is unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256
BEAM_TILE = 384


def _kernel(spec_ref, fs_ref, wsum_ref, g0_ref, g1_ref, g2_ref, cf_ref,
            out_ref, *, max_range):
    s = spec_ref[:]                                          # (RT, T)
    g0 = jnp.dot(s, g0_ref[:], preferred_element_type=s.dtype)
    g1 = jnp.dot(s, g1_ref[:], preferred_element_type=s.dtype)
    g2 = jnp.dot(s, g2_ref[:], preferred_element_type=s.dtype)

    alpha = fs_ref[:] + cf_ref[:]                            # (RT,1)+(1,BT)
    w0 = jnp.maximum(1.0 - alpha, 0.0)
    w2 = jnp.maximum(alpha - 1.0, 0.0)
    w1 = 1.0 - w0 - w2
    out = w0 * g0 + w1 * g1 + w2 * g2
    out = jnp.where(wsum_ref[:] > 0.0, out, 0.0)
    out_ref[:] = jnp.clip(out, 0.0, max_range)


@functools.lru_cache(maxsize=None)
def _make(max_range: float):
    @jax.custom_batching.custom_vmap
    def theta_shuffle_blend(spec_r, f_s, wsum, gmat, c_frac):
        """out[k, b] = clip(mask(3-tap blend over taps t of
        (spec_r @ gmat)[k, t*B+b], weights from alpha = f_s[k] + c_frac[b])).

        spec_r (K, T), f_s (K,), wsum (K,), gmat (T, 3B), c_frac (B,)
        -> (K, B)."""
        k_n, t_bins = spec_r.shape
        b_n = c_frac.shape[0]
        dtype = spec_r.dtype

        g0m = gmat[:, :b_n]
        g1m = gmat[:, b_n:2 * b_n]
        g2m = gmat[:, 2 * b_n:]
        fs2 = f_s[:, None].astype(dtype)
        ws2 = wsum[:, None].astype(dtype)
        cf2 = c_frac[None, :].astype(dtype)

        grid = (pl.cdiv(b_n, BEAM_TILE), pl.cdiv(k_n, ROW_TILE))
        interpret = jax.default_backend() != "tpu"

        return pl.pallas_call(
            functools.partial(_kernel, max_range=max_range),
            out_shape=jax.ShapeDtypeStruct((k_n, b_n), dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROW_TILE, t_bins), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROW_TILE, BEAM_TILE), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(spec_r, fs2, ws2, g0m, g1m, g2m, cf2)

    @theta_shuffle_blend.def_vmap
    def _vmap_rule(axis_size, in_batched, spec_r, f_s, wsum, gmat, c_frac):
        """Collapse the mapped axis into the row dim (row-parallel op)."""
        sb, fb, wb, gb, cb = in_batched
        assert not (gb or cb), "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        spec_b = mat(spec_r, sb)        # (E, K, T)
        fs_b = mat(f_s, fb)             # (E, K)
        ws_b = mat(wsum, wb)
        e, k_n, t_bins = spec_b.shape
        out = theta_shuffle_blend(spec_b.reshape(e * k_n, t_bins),
                                  fs_b.reshape(e * k_n),
                                  ws_b.reshape(e * k_n),
                                  gmat, c_frac)
        return out.reshape(e, k_n, out.shape[-1]), True

    return theta_shuffle_blend


def theta_shuffle_blend(spec_r, f_s, wsum, gmat, c_frac, max_range: float):
    """Fused shuffle-matmul + 3-tap theta blend (see module docstring).

    ``max_range`` is a static Python float (specializes the kernel)."""
    return _make(float(max_range))(spec_r, f_s, wsum, gmat, c_frac)
