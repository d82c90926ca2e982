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


# ---------------------------------------------------------------------------
# Edge-aware variant: occlusion ramp rendering fused into the shuffle matmul
# ---------------------------------------------------------------------------
#
# rt_occlusion="edge" triples the shuffled payload (range row + e/w channel
# rows through the same (T, 3B) matrix) and adds a wide elementwise ramp
# tail.  In plain XLA the (rows, 3, 3B) intermediate round-trips HBM —
# ~1.3 GB/step at 16k 2-agent envs, measured 3x slower end-to-end than the
# spectral mode.  Here the taps never leave VMEM: per tile, three f32 MXU
# passes produce the range taps and four passes at cfg.rt_ew_dtype — bf16 on
# TPU by default: e/w values live in [0, 1]-ish ranges where bf16's 2^-8
# relative error is far below the build-time edge precision of 2^-6 bins —
# produce the channel taps, then the parallax-corrected ramp is rendered in
# registers and only the final (rows, beams) scan is written out.

def _edge_render_tile(sr, se_f32, sw_f32, g0m, g1m, g2m, fs, wsum, cf,
                      max_range, ew_dtype):
    """Shared edge-ramp render body (values already loaded from VMEM refs):
    3 f32 range-tap matmuls, 4 channel-tap matmuls at `ew_dtype`, parallax
    ramp.  Used verbatim by the plain edge kernel and the edge+iTTC kernel
    — one formula, two launch configurations.

    Channel taps use the pair's two bins only (blocks 0 and 1).  At the
    bf16 default: bf16 inputs, f32 accumulate — full MXU rate, error
    ~2^-8 relative on a [0, 1] channel, negligible against the 2^-6-bin
    build precision.  cfg.rt_ew_dtype="float32" opts into full-precision
    taps (same resolution rule as the XLA edge epilogue)."""
    g0 = jnp.dot(sr, g0m, preferred_element_type=sr.dtype)
    g1 = jnp.dot(sr, g1m, preferred_element_type=sr.dtype)
    g2 = jnp.dot(sr, g2m, preferred_element_type=sr.dtype)

    se = se_f32.astype(ew_dtype)
    sw = sw_f32.astype(ew_dtype)
    g0b = g0m.astype(ew_dtype)
    g1b = g1m.astype(ew_dtype)
    e_a = jnp.dot(se, g0b, preferred_element_type=sr.dtype)
    e_b = jnp.dot(se, g1b, preferred_element_type=sr.dtype)
    w_a = jnp.dot(sw, g0b, preferred_element_type=sr.dtype)
    w_b = jnp.dot(sw, g1b, preferred_element_type=sr.dtype)

    alpha = fs + cf                                          # (RT,1)+(1,BT)
    lt = alpha < 1.0
    frac = alpha - jnp.floor(alpha)
    ga = jnp.where(lt, g0, g1)
    gb = jnp.where(lt, g1, g2)
    e_sel = jnp.clip(jnp.where(lt, e_a, e_b), 0.0, 1.0)
    w_sel = jnp.clip(jnp.where(lt, w_a, w_b), 1.0 / 32.0, 1.0)
    aa = jnp.clip((frac - (e_sel - 0.5 * w_sel)) / w_sel, 0.0, 1.0)
    out = ga + aa * (gb - ga)
    out = jnp.where(wsum > 0.0, out, 0.0)
    return jnp.clip(out, 0.0, max_range)


def _noise_ttc_tile(out, noise, vel, cos, side, agents_per_env, n_beams,
                    ttc_thresh, beam_tile):
    """Shared fused-consumer tail: expand the per-env noise slab across
    agent rows in VMEM, add it, and compute the per-(beam-tile, row) iTTC
    partial on the noisy scan (agent_scan.check_ttc, division-free
    sign-split form), masked to real beams (the last beam tile is padded:
    its tap garbage must not raise phantom hits).  ``beam_tile`` is the
    caller's beam-axis grid index — the edge_ttc kernels iterate beams on
    grid dim 0, the megakernel carries the FULL beam width in one block and
    must pass 0 (deriving it from pl.program_id(0) here silently masked
    every beam for row tiles >= 1 under mega's row-only grid: all iTTC hits
    beyond the first 128 envs were dropped — caught round 5).  Returns
    (noisy_out (RT, BT), partial (8, RT))."""
    rt, bt = out.shape
    # upcast BEFORE the rank-3 broadcast/reshape: the noise slab may arrive
    # in its bfloat16 storage dtype and Mosaic's layout inference rejects
    # the 3-D shape cast on bf16 vectors ("unsupported shape cast", live
    # round-5 finding)
    n = noise.astype(out.dtype)
    n = jnp.broadcast_to(n[:, None, :],
                         (rt // agents_per_env, agents_per_env, bt)
                         ).reshape(rt, bt)
    out = out + n

    beam_ok = (beam_tile * bt
               + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)) < n_beams
    pv = vel * cos                                           # (RT,1)*(1,BT)
    num = out - side
    # NB: all-logical form, not jnp.where(pv > 0, <bool>, <bool>) — a select
    # whose BRANCHES are boolean vectors lowers through an i8 promotion and
    # an i8->i1 arith.trunci that Mosaic rejects on real TPU ("Unsupported
    # target bitwidth for truncation", caught live in round 4).  The two
    # arms are mutually exclusive on the sign of pv, so or-ing them is
    # bit-identical to the select (pv == 0 yields False either way).
    hit = (((pv > 0.0) & (num >= 0.0) & (num < ttc_thresh * pv))
           | ((pv < 0.0) & (num <= 0.0) & (num > ttc_thresh * pv)))
    # per-beam-tile partial reduce; the (8*jn, K) output gives every grid
    # step its own block (an output block revisited at non-consecutive
    # grid steps is undefined on TPU — the beam axis is the OUTER grid
    # dim here, so accumulating in-place across j would be one), and the
    # tiny final max over the partial rows runs in XLA.  The partial is
    # broadcast to an (8, RT) block: Mosaic requires the sublane dim of an
    # output block to be 8-divisible (a (1, RT) block fails to lower on
    # real TPU — caught live in round 4), and row-tile lanes (multiple of
    # 128) beat a single-lane (RT, 1) column layout.
    one = jnp.ones((), out.dtype)
    partial = jnp.max(jnp.where(hit & beam_ok, one, 0.0 * one), axis=1)
    return out, jnp.broadcast_to(partial[None, :], (8, partial.shape[0]))


def _edge_kernel(specr_ref, spece_ref, specw_ref, fs_ref, wsum_ref,
                 g0_ref, g1_ref, g2_ref, cf_ref, out_ref, *, max_range,
                 ew_dtype):
    out_ref[:] = _edge_render_tile(
        specr_ref[:], spece_ref[:], specw_ref[:], g0_ref[:], g1_ref[:],
        g2_ref[:], fs_ref[:], wsum_ref[:], cf_ref[:], max_range, ew_dtype)


@functools.lru_cache(maxsize=None)
def _make_edge(max_range: float, ew_dtype):
    @jax.custom_batching.custom_vmap
    def theta_shuffle_blend_edge(spec_r, spec_e, spec_w, f_s, wsum, gmat,
                                 c_frac):
        """Edge-ramp variant: spec_r/spec_e/spec_w (K, T) are the rolled
        packed spectra of the range row and the (parallax-corrected) e/w
        channel rows; returns the rendered (K, B) scan."""
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

        row_spec = pl.BlockSpec((ROW_TILE, t_bins), lambda j, i: (i, 0),
                                memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_edge_kernel, max_range=max_range,
                              ew_dtype=ew_dtype),
            out_shape=jax.ShapeDtypeStruct((k_n, b_n), dtype),
            grid=grid,
            in_specs=[row_spec, row_spec, row_spec, scal_spec, scal_spec,
                      col_spec, col_spec, col_spec,
                      pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROW_TILE, BEAM_TILE), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(spec_r, spec_e, spec_w, fs2, ws2, g0m, g1m, g2m, cf2)

    @theta_shuffle_blend_edge.def_vmap
    def _vmap_rule(axis_size, in_batched, spec_r, spec_e, spec_w, f_s, wsum,
                   gmat, c_frac):
        srb, seb, swb, fb, wb, gb, cb = in_batched
        assert not (gb or cb), "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        spec_rb = mat(spec_r, srb)      # (E, K, T)
        spec_eb = mat(spec_e, seb)
        spec_wb = mat(spec_w, swb)
        fs_b = mat(f_s, fb)             # (E, K)
        ws_b = mat(wsum, wb)
        e, k_n, t_bins = spec_rb.shape
        out = theta_shuffle_blend_edge(
            spec_rb.reshape(e * k_n, t_bins),
            spec_eb.reshape(e * k_n, t_bins),
            spec_wb.reshape(e * k_n, t_bins),
            fs_b.reshape(e * k_n), ws_b.reshape(e * k_n), gmat, c_frac)
        return out.reshape(e, k_n, out.shape[-1]), True

    return theta_shuffle_blend_edge


def theta_shuffle_blend_edge(spec_r, spec_e, spec_w, f_s, wsum, gmat, c_frac,
                             max_range: float, ew_dtype=jnp.bfloat16):
    """Fused shuffle-matmul + edge-ramp rendering (see module comment).
    `ew_dtype` is the channel-tap matmul dtype (cfg.rt_ew_dtype resolved
    by the caller; bf16 default keeps full MXU rate on the [0,1] e/w
    channels)."""
    return _make_edge(float(max_range), jnp.dtype(ew_dtype).name)(
        spec_r, spec_e, spec_w, f_s, wsum, gmat, c_frac)


# ---------------------------------------------------------------------------
# Edge variant with the scan CONSUMERS fused in: noise add + iTTC wall check
# ---------------------------------------------------------------------------
#
# After the scan is rendered, the env step adds per-env sensor noise and runs
# the iTTC wall check (ops/agent_scan.py::check_ttc) — both elementwise over
# the (envs, agents, beams) scan.  In plain XLA that is one extra full write
# (the noisy scan) and one extra full read (the iTTC pass) of a ~135 MB
# tensor per step at 16k 2-agent envs.  Here both happen in registers while
# the rendered tile is still in VMEM: the kernel writes the NOISY scan (what
# every downstream consumer wants) plus per-(beam-tile, row) hit partials;
# the tiny (jn, K) max-reduce happens in XLA.
#
# Noise is per ENV but rows are (env, agent)-flattened; the noise operand
# stays (E, B) in HBM and each kernel row tile reads the (ROW_TILE/A, B)
# env slab and expands it across the A agent rows in VMEM (requires
# A | ROW_TILE; callers fall back to the unfused path otherwise).

def _opp_raycast_tile(out, opp, cos, sin, n_opp, beam_start=0):
    """Fused opponent ray casting on the rendered tile (the last consumer
    of the scan in env.sim_step — ops/agent_scan.py::ray_cast_all_opponents
    semantics).  ``opp`` is the (RT, 10 * n_opp) per-row slab-scalar pack
    from scan_fast.opponent_slab_scalars: per opponent
    [lo, hi, a_u, b_u, a_w, b_w, o_u, o_w, hu, hw] where the beam direction
    in the opponent's box frame is d_u = a_u cos_b + b_u sin_b (a per-row
    rotation folded with the box axes — two FMAs per beam against the
    static tables instead of materializing (rows, B, 2) world dirs).
    In plain XLA this stage costs a full read + write of the (E, A, B)
    scan tensor (~0.38 ms/step measured at 16k 2-agent envs); here the
    tile is still in registers."""
    rt, bt = out.shape
    beam_pos = (beam_start
                + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
                ).astype(out.dtype)                       # (1, BT)
    inf = jnp.asarray(jnp.inf, out.dtype)
    for o in range(n_opp):
        c0 = 10 * o
        col = lambda k: opp[:, c0 + k:c0 + k + 1]         # (RT, 1)
        lo, hi = col(0), col(1)
        a_u, b_u, a_w, b_w = col(2), col(3), col(4), col(5)
        o_u, o_w, hu, hw = col(6), col(7), col(8), col(9)
        d_u = a_u * cos + b_u * sin                       # (RT, BT)
        d_w = a_w * cos + b_w * sin
        # slab test (agent_scan._slab), inlined with the same
        # parallel-beam rescue semantics
        inv_u = 1.0 / d_u
        t1u = (-hu - o_u) * inv_u
        t2u = (hu - o_u) * inv_u
        near_u = jnp.minimum(t1u, t2u)
        far_u = jnp.maximum(t1u, t2u)
        par_u = d_u == 0.0
        in_u = jnp.abs(o_u) <= hu
        near_u = jnp.where(par_u, jnp.where(in_u, -inf, inf), near_u)
        far_u = jnp.where(par_u, jnp.where(in_u, inf, -inf), far_u)
        inv_w = 1.0 / d_w
        t1w = (-hw - o_w) * inv_w
        t2w = (hw - o_w) * inv_w
        near_w = jnp.minimum(t1w, t2w)
        far_w = jnp.maximum(t1w, t2w)
        par_w = d_w == 0.0
        in_w = jnp.abs(o_w) <= hw
        near_w = jnp.where(par_w, jnp.where(in_w, -inf, inf), near_w)
        far_w = jnp.where(par_w, jnp.where(in_w, inf, -inf), far_w)
        tmin = jnp.maximum(near_u, near_w)
        tmax = jnp.minimum(far_u, far_w)
        hit = (tmax >= tmin) & (tmax >= 0.0)
        t = jnp.where(tmin >= 0.0, tmin, tmax)
        t = jnp.where(hit, t, inf)
        mask = (beam_pos >= lo) & (beam_pos <= hi)
        out = jnp.where(mask, jnp.minimum(out, t), out)
    return out


def _edge_ttc_kernel(specr_ref, spece_ref, specw_ref, fs_ref, wsum_ref,
                     vel_ref, g0_ref, g1_ref, g2_ref, cf_ref, noise_ref,
                     cos_ref, side_ref, out_ref, hit_ref, *,
                     max_range, ttc_thresh, agents_per_env, n_beams,
                     ew_dtype):
    out = _edge_render_tile(
        specr_ref[:], spece_ref[:], specw_ref[:], g0_ref[:], g1_ref[:],
        g2_ref[:], fs_ref[:], wsum_ref[:], cf_ref[:], max_range, ew_dtype)
    out_ref[:], hit_ref[:] = _noise_ttc_tile(
        out, noise_ref[:], vel_ref[:], cos_ref[:], side_ref[:],
        agents_per_env, n_beams, ttc_thresh, beam_tile=pl.program_id(0))


def _edge_ttc_opp_kernel(specr_ref, spece_ref, specw_ref, fs_ref, wsum_ref,
                         vel_ref, g0_ref, g1_ref, g2_ref, cf_ref, noise_ref,
                         cos_ref, sin_ref, side_ref, opp_ref, out_ref,
                         hit_ref, *, max_range, ttc_thresh, agents_per_env,
                         n_beams, n_opp, ew_dtype):
    out = _edge_render_tile(
        specr_ref[:], spece_ref[:], specw_ref[:], g0_ref[:], g1_ref[:],
        g2_ref[:], fs_ref[:], wsum_ref[:], cf_ref[:], max_range, ew_dtype)
    # order matches env.sim_step: noise -> iTTC partial (pre-opponent
    # scan, reference base_classes.py:227-252) -> opponent ray cast
    out, hit_ref[:] = _noise_ttc_tile(
        out, noise_ref[:], vel_ref[:], cos_ref[:], side_ref[:],
        agents_per_env, n_beams, ttc_thresh, beam_tile=pl.program_id(0))
    out_ref[:] = _opp_raycast_tile(
        out, opp_ref[:], cos_ref[:], sin_ref[:], n_opp,
        beam_start=pl.program_id(0) * out.shape[1])


@functools.lru_cache(maxsize=None)
def _make_edge_ttc(max_range: float, ttc_thresh: float, agents_per_env: int,
                   ew_dtype="bfloat16"):
    a_n = agents_per_env
    assert ROW_TILE % a_n == 0

    @jax.custom_batching.custom_vmap
    def edge_ttc(spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac,
                 noise, cosines, side_dist):
        """Edge-ramp render + fused noise add + iTTC check.

        Row k is (env k // A, agent k % A); noise (E, B) is per env.
        Returns (noisy scan (K, B), hit (K,) float 0/1 — pre `vel != 0`
        mask and any-reduce already applied over beams)."""
        k_n, t_bins = spec_r.shape
        b_n = c_frac.shape[0]
        dtype = spec_r.dtype
        assert k_n == noise.shape[0] * a_n

        g0m = gmat[:, :b_n]
        g1m = gmat[:, b_n:2 * b_n]
        g2m = gmat[:, 2 * b_n:]
        fs2 = f_s[:, None].astype(dtype)
        ws2 = wsum[:, None].astype(dtype)
        vel2 = vel[:, None].astype(dtype)
        cf2 = c_frac[None, :].astype(dtype)
        cos2 = cosines[None, :].astype(dtype)
        side2 = side_dist[None, :].astype(dtype)

        grid = (pl.cdiv(b_n, BEAM_TILE), pl.cdiv(k_n, ROW_TILE))
        interpret = jax.default_backend() != "tpu"

        row_spec = pl.BlockSpec((ROW_TILE, t_bins), lambda j, i: (i, 0),
                                memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM)
        beam_spec = pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM)
        jn = pl.cdiv(b_n, BEAM_TILE)
        out, hit = pl.pallas_call(
            functools.partial(_edge_ttc_kernel, max_range=max_range,
                              ttc_thresh=ttc_thresh, agents_per_env=a_n,
                              n_beams=b_n, ew_dtype=ew_dtype),
            out_shape=(jax.ShapeDtypeStruct((k_n, b_n), dtype),
                       jax.ShapeDtypeStruct((8 * jn, k_n), dtype)),
            grid=grid,
            in_specs=[row_spec, row_spec, row_spec, scal_spec, scal_spec,
                      scal_spec, col_spec, col_spec, col_spec, beam_spec,
                      pl.BlockSpec((ROW_TILE // a_n, BEAM_TILE),
                                   lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
                      beam_spec, beam_spec],
            out_specs=(pl.BlockSpec((ROW_TILE, BEAM_TILE),
                                    lambda j, i: (i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, ROW_TILE), lambda j, i: (j, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(spec_r, spec_e, spec_w, fs2, ws2, vel2, g0m, g1m, g2m, cf2,
          noise, cos2, side2)
        return out, jnp.max(hit, axis=0)

    @edge_ttc.def_vmap
    def _vmap_rule(axis_size, in_batched, spec_r, spec_e, spec_w, f_s, wsum,
                   vel, gmat, c_frac, noise, cosines, side_dist):
        (srb, seb, swb, fb, wb, vb, gb, cb, nb, cob, sib) = in_batched
        assert not (gb or cb or cob or sib), \
            "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        spec_rb = mat(spec_r, srb)          # (E, K, T)
        spec_eb = mat(spec_e, seb)
        spec_wb = mat(spec_w, swb)
        fs_b = mat(f_s, fb)                 # (E, K)
        ws_b = mat(wsum, wb)
        vel_b = mat(vel, vb)
        noise_b = mat(noise, nb)            # (E, Eg, B) with Eg rows/env
        e, k_n, t_bins = spec_rb.shape
        noise_b = noise_b.reshape(e * noise_b.shape[1], noise_b.shape[2])
        out, hit = edge_ttc(
            spec_rb.reshape(e * k_n, t_bins),
            spec_eb.reshape(e * k_n, t_bins),
            spec_wb.reshape(e * k_n, t_bins),
            fs_b.reshape(e * k_n), ws_b.reshape(e * k_n),
            vel_b.reshape(e * k_n), gmat, c_frac, noise_b, cosines,
            side_dist)
        return (out.reshape(e, k_n, out.shape[-1]),
                hit.reshape(e, k_n)), (True, True)

    return edge_ttc


@functools.lru_cache(maxsize=None)
def _make_edge_ttc_opp(max_range: float, ttc_thresh: float,
                       agents_per_env: int, n_opp: int, ew_dtype="bfloat16"):
    a_n = agents_per_env
    assert ROW_TILE % a_n == 0

    @jax.custom_batching.custom_vmap
    def edge_ttc_opp(spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac,
                     noise, cosines, sines, side_dist, opp):
        """Edge render + noise + iTTC + opponent ray cast in ONE kernel.

        Same contract as edge_ttc plus ``sines`` (B,) static beam sines and
        ``opp`` (K, 10 * n_opp) slab scalars (scan_fast.
        opponent_slab_scalars).  Returns (post-opponent noisy scan (K, B),
        pre-opponent iTTC hit (K,))."""
        k_n, t_bins = spec_r.shape
        b_n = c_frac.shape[0]
        dtype = spec_r.dtype
        assert k_n == noise.shape[0] * a_n
        assert opp.shape == (k_n, 10 * n_opp)

        g0m = gmat[:, :b_n]
        g1m = gmat[:, b_n:2 * b_n]
        g2m = gmat[:, 2 * b_n:]
        fs2 = f_s[:, None].astype(dtype)
        ws2 = wsum[:, None].astype(dtype)
        vel2 = vel[:, None].astype(dtype)
        cf2 = c_frac[None, :].astype(dtype)
        cos2 = cosines[None, :].astype(dtype)
        sin2 = sines[None, :].astype(dtype)
        side2 = side_dist[None, :].astype(dtype)

        grid = (pl.cdiv(b_n, BEAM_TILE), pl.cdiv(k_n, ROW_TILE))
        interpret = jax.default_backend() != "tpu"

        row_spec = pl.BlockSpec((ROW_TILE, t_bins), lambda j, i: (i, 0),
                                memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM)
        beam_spec = pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM)
        jn = pl.cdiv(b_n, BEAM_TILE)
        out, hit = pl.pallas_call(
            functools.partial(_edge_ttc_opp_kernel, max_range=max_range,
                              ttc_thresh=ttc_thresh, agents_per_env=a_n,
                              n_beams=b_n, n_opp=n_opp, ew_dtype=ew_dtype),
            out_shape=(jax.ShapeDtypeStruct((k_n, b_n), dtype),
                       jax.ShapeDtypeStruct((8 * jn, k_n), dtype)),
            grid=grid,
            in_specs=[row_spec, row_spec, row_spec, scal_spec, scal_spec,
                      scal_spec, col_spec, col_spec, col_spec, beam_spec,
                      pl.BlockSpec((ROW_TILE // a_n, BEAM_TILE),
                                   lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
                      beam_spec, beam_spec, beam_spec,
                      pl.BlockSpec((ROW_TILE, 10 * n_opp),
                                   lambda j, i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((ROW_TILE, BEAM_TILE),
                                    lambda j, i: (i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, ROW_TILE), lambda j, i: (j, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(spec_r, spec_e, spec_w, fs2, ws2, vel2, g0m, g1m, g2m, cf2,
          noise, cos2, sin2, side2, opp)
        return out, jnp.max(hit, axis=0)

    @edge_ttc_opp.def_vmap
    def _vmap_rule(axis_size, in_batched, spec_r, spec_e, spec_w, f_s, wsum,
                   vel, gmat, c_frac, noise, cosines, sines, side_dist, opp):
        (srb, seb, swb, fb, wb, vb, gb, cb, nb, cob, sib, sdb,
         ob) = in_batched
        assert not (gb or cb or cob or sib or sdb), \
            "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        spec_rb = mat(spec_r, srb)          # (E, K, T)
        spec_eb = mat(spec_e, seb)
        spec_wb = mat(spec_w, swb)
        fs_b = mat(f_s, fb)                 # (E, K)
        ws_b = mat(wsum, wb)
        vel_b = mat(vel, vb)
        noise_b = mat(noise, nb)            # (E, Eg, B)
        opp_b = mat(opp, ob)                # (E, K, 10 * n_opp)
        e, k_n, t_bins = spec_rb.shape
        noise_b = noise_b.reshape(e * noise_b.shape[1], noise_b.shape[2])
        out, hit = edge_ttc_opp(
            spec_rb.reshape(e * k_n, t_bins),
            spec_eb.reshape(e * k_n, t_bins),
            spec_wb.reshape(e * k_n, t_bins),
            fs_b.reshape(e * k_n), ws_b.reshape(e * k_n),
            vel_b.reshape(e * k_n), gmat, c_frac, noise_b, cosines, sines,
            side_dist, opp_b.reshape(e * k_n, opp_b.shape[-1]))
        return (out.reshape(e, k_n, out.shape[-1]),
                hit.reshape(e, k_n)), (True, True)

    return edge_ttc_opp


def theta_shuffle_blend_edge_ttc_opp(spec_r, spec_e, spec_w, f_s, wsum, vel,
                                     gmat, c_frac, noise, cosines, sines,
                                     side_dist, opp, max_range: float,
                                     ttc_thresh: float, agents_per_env: int,
                                     ew_dtype=jnp.bfloat16):
    """Fully-fused scan epilogue: edge render + noise + iTTC + opponent ray
    cast (see _opp_raycast_tile).  ``opp`` is (K, 10 * n_opp)."""
    n_opp = opp.shape[-1] // 10
    return _make_edge_ttc_opp(float(max_range), float(ttc_thresh),
                              int(agents_per_env), int(n_opp),
                              jnp.dtype(ew_dtype).name)(
        spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac, noise,
        cosines, sines, side_dist, opp)


# ---------------------------------------------------------------------------
# Spectral variant with fused consumers: one smat matmul + noise + iTTC
# ---------------------------------------------------------------------------
#
# The spectral ("ultra") interpolation needs no tap pipeline at all — the
# rolled spectrum hits one constant (T, B) trig matrix.  Its XLA tail is a
# single cheap matmul, which is why scan_backend="auto" keeps XLA there;
# but the scan's CONSUMERS (noise add + iTTC) still cost a full extra HBM
# write + read of the (E, A, B) scan per step.  This kernel folds them in,
# same layout/contract as the edge+ttc variant above.

def _spec_ttc_kernel(spec_ref, wsum_ref, vel_ref, smat_ref, noise_ref,
                     cos_ref, side_ref, out_ref, hit_ref, *,
                     max_range, ttc_thresh, agents_per_env, n_beams):
    s = spec_ref[:]                                          # (RT, T)
    out = jnp.dot(s, smat_ref[:], preferred_element_type=s.dtype)
    out = jnp.where(wsum_ref[:] > 0.0, out, 0.0)
    out = jnp.clip(out, 0.0, max_range)
    out_ref[:], hit_ref[:] = _noise_ttc_tile(
        out, noise_ref[:], vel_ref[:], cos_ref[:], side_ref[:],
        agents_per_env, n_beams, ttc_thresh, beam_tile=pl.program_id(0))


@functools.lru_cache(maxsize=None)
def _make_spec_ttc(max_range: float, ttc_thresh: float, agents_per_env: int):
    a_n = agents_per_env
    assert ROW_TILE % a_n == 0

    @jax.custom_batching.custom_vmap
    def spec_ttc(spec_r, wsum, vel, smat, noise, cosines, side_dist):
        """Spectral render + fused noise add + iTTC check.

        spec_r (K, T) is the phase-rolled packed spectrum; smat (T, B) the
        windowed trig evaluation matrix.  Same row/noise contract as
        theta_shuffle_blend_edge_ttc."""
        k_n, t_bins = spec_r.shape
        b_n = smat.shape[1]
        dtype = spec_r.dtype
        assert k_n == noise.shape[0] * a_n

        ws2 = wsum[:, None].astype(dtype)
        vel2 = vel[:, None].astype(dtype)
        cos2 = cosines[None, :].astype(dtype)
        side2 = side_dist[None, :].astype(dtype)

        grid = (pl.cdiv(b_n, BEAM_TILE), pl.cdiv(k_n, ROW_TILE))
        interpret = jax.default_backend() != "tpu"

        row_spec = pl.BlockSpec((ROW_TILE, t_bins), lambda j, i: (i, 0),
                                memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((t_bins, BEAM_TILE), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM)
        beam_spec = pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM)
        jn = pl.cdiv(b_n, BEAM_TILE)
        out, hit = pl.pallas_call(
            functools.partial(_spec_ttc_kernel, max_range=max_range,
                              ttc_thresh=ttc_thresh, agents_per_env=a_n,
                              n_beams=b_n),
            out_shape=(jax.ShapeDtypeStruct((k_n, b_n), dtype),
                       jax.ShapeDtypeStruct((8 * jn, k_n), dtype)),
            grid=grid,
            in_specs=[row_spec, scal_spec, scal_spec, col_spec,
                      pl.BlockSpec((ROW_TILE // a_n, BEAM_TILE),
                                   lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
                      beam_spec, beam_spec],
            out_specs=(pl.BlockSpec((ROW_TILE, BEAM_TILE),
                                    lambda j, i: (i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, ROW_TILE), lambda j, i: (j, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(spec_r, ws2, vel2, smat, noise, cos2, side2)
        return out, jnp.max(hit, axis=0)

    @spec_ttc.def_vmap
    def _vmap_rule(axis_size, in_batched, spec_r, wsum, vel, smat, noise,
                   cosines, side_dist):
        (srb, wb, vb, smb, nb, cob, sib) = in_batched
        assert not (smb or cob or sib), \
            "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        spec_rb = mat(spec_r, srb)          # (E, K, T)
        ws_b = mat(wsum, wb)
        vel_b = mat(vel, vb)
        noise_b = mat(noise, nb)            # (E, Eg, B)
        e, k_n, t_bins = spec_rb.shape
        noise_b = noise_b.reshape(e * noise_b.shape[1], noise_b.shape[2])
        out, hit = spec_ttc(
            spec_rb.reshape(e * k_n, t_bins), ws_b.reshape(e * k_n),
            vel_b.reshape(e * k_n), smat, noise_b, cosines, side_dist)
        return (out.reshape(e, k_n, out.shape[-1]),
                hit.reshape(e, k_n)), (True, True)

    return spec_ttc


def theta_spectral_ttc(spec_r, wsum, vel, smat, noise, cosines, side_dist,
                       max_range: float, ttc_thresh: float,
                       agents_per_env: int):
    """Fused spectral render + noise add + iTTC check (see comment above).

    Same contract as :func:`theta_shuffle_blend_edge_ttc`: ``noise`` is one
    row per env, rows are (env, agent)-flattened with ``agents_per_env``
    rows per env, and callers apply the ``vel != 0`` mask."""
    return _make_spec_ttc(float(max_range), float(ttc_thresh),
                          int(agents_per_env))(
        spec_r, wsum, vel, smat, noise, cosines, side_dist)


def theta_shuffle_blend_edge_ttc(spec_r, spec_e, spec_w, f_s, wsum, vel,
                                 gmat, c_frac, noise, cosines, side_dist,
                                 max_range: float, ttc_thresh: float,
                                 agents_per_env: int,
                                 ew_dtype=jnp.bfloat16):
    """Fused edge render + noise add + iTTC wall check (see module comment).

    ``noise`` carries one row per env ((E, B); rows are (env, agent)-
    flattened with ``agents_per_env`` rows per env).  Returns
    (noisy_scan (K, B), hit (K,) float 0/1); callers still apply the
    ``vel != 0`` mask (reference laser_models.py:188-217 semantics via
    ops/agent_scan.py::check_ttc)."""
    return _make_edge_ttc(float(max_range), float(ttc_thresh),
                          int(agents_per_env), jnp.dtype(ew_dtype).name)(
        spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac, noise,
        cosines, side_dist)


# ---------------------------------------------------------------------------
# Megakernel: the ENTIRE post-gather fast-scan pipeline in one launch
# ---------------------------------------------------------------------------
#
# The round-5 profiler shows the XLA chain BETWEEN the texture-row gather
# and the fused epilogue kernel — grad fold, edge parallax, the packed-DFT
# roll — costs ~1.7 ms/step at 16k envs while using <20% of any hardware
# roofline: it is fragmented into ~10 small kernels plus layout copies.
# This kernel consumes the RAW gathered rows (rows, C*T) and produces the
# finished noisy scan + iTTC flags in one launch:
#
#   channels split (static 128-lane slices) -> f32 upcast -> gradient
#   pose-fold -> exact corner-bearing parallax -> 3 packed-rfft matmuls ->
#   integer DFT roll -> 7 tap matmuls -> edge-ramp render -> noise add ->
#   iTTC partials.
#
# No in-kernel permutes: the roll-by-64 the packed twiddle needs is folded
# into a SECOND constant matrix (fmat_sw = fmat with columns rotated 64,
# so X @ fmat_sw == roll(X @ fmat, -64)), and the one-lane shift the
# parallax needs is a constant (T, T) shift matrix — both tiny MXU work.
# Beams are NOT tiled (whole 1080-beam row per grid step): VMEM holds the
# full gmat (T, 3B, ~1.7 MB) resident, and the grid is 1-D over row tiles.

def _atan2_poly(y, x):
    """Branch-free atan2 for Mosaic, which has NO atan2 primitive (probed
    live on round-5 hardware: "Unimplemented primitive in Pallas TPU
    lowering ... atan2").  Octant reduction + an 11th-degree minimax atan
    polynomial on [0, 1] (|err| ~ 1e-6 rad — the parallax consumer shifts
    the rendered edge by err/dth < 1e-4 theta bins, far inside the 2^-6-bin
    build precision of the edge channel)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    z = num / jnp.maximum(den, 1e-30)
    z2 = z * z
    p = z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
             + z2 * (-0.11643287 + z2 * (0.05265332 + z2 * (-0.01172120))))))
    half_pi = 0.5 * jnp.pi
    a = jnp.where(ay > ax, half_pi - p, p)
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _mega_kernel(raw_ref, scal_ref, fmat_ref, fmatsw_ref, shift1_ref,
                 g0_ref, g1_ref, g2_ref, cf_ref, noise_ref, cos_ref,
                 side_ref, *refs,
                 max_range, ttc_thresh, agents_per_env, n_beams, t_bins,
                 n_opp, ew_dtype, pool_rows):
    if n_opp and pool_rows:
        sin_ref, opp_ref, pool_ref, out_ref, hit_ref = refs
    elif n_opp:
        sin_ref, opp_ref, out_ref, hit_ref = refs
    elif pool_rows:
        pool_ref, out_ref, hit_ref = refs
    else:
        out_ref, hit_ref = refs
    f32 = jnp.float32
    T = t_bins
    raw = raw_ref[:]                                        # (RT, 5T) bf16?
    R = raw[:, 0:T].astype(f32)
    e = raw[:, T:2 * T].astype(f32)
    w = raw[:, 2 * T:3 * T].astype(f32)
    gx = raw[:, 3 * T:4 * T].astype(f32)
    gy = raw[:, 4 * T:5 * T].astype(f32)
    # per-row scalars ride ONE packed (RT, 8) operand: six separate (RT, 1)
    # operands each DMA'd a full 128-lane-padded stream AND dragged their
    # own (E, A)->(K, 1) layout-copy kernel upstream (~6 copies visible in
    # the round-5 profile); packed, there is one stream and one copy
    sc = scal_ref[:]                                        # (RT, 8)
    dx = sc[:, 0:1]
    dy = sc[:, 1:2]
    fs_col = sc[:, 2:3]
    ii_col = sc[:, 3:4]
    inb_col = sc[:, 4:5]
    vel_col = sc[:, 5:6]

    # gradient pose-fold (scan_fast.trace_fast_mxu "per-cell channel
    # corrections"), identical op order
    rr_c = jnp.clip(R + dx * gx + dy * gy, 0.0, max_range)

    # exact corner-bearing parallax on the raw range row
    two_pi = 2.0 * jnp.pi
    dth = two_pi / T
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    theta_e = (lane.astype(f32) + e) * dth
    r_next = jnp.dot(R, shift1_ref[:], preferred_element_type=f32)
    r_fore = jnp.maximum(jnp.minimum(R, r_next), 0.05)
    ex = r_fore * jnp.cos(theta_e) - dx
    ey = r_fore * jnp.sin(theta_e) - dy
    beta = _atan2_poly(ey, ex)
    dbeta = beta - theta_e
    dbeta = dbeta - jnp.round(dbeta / two_pi) * two_pi
    e = e + (1.0 - w) * dbeta / dth

    # packed-rfft + integer roll: spec_r = spec * P + spec_sw * QR with
    # spec = X @ fmat, spec_sw = X @ fmat_sw (columns pre-rotated by T/2),
    # and P/QR the per-row twiddle masks of the packed layout
    # [Re 0..T/2 | Im 1..T/2-1]
    ii = ii_col.astype(jnp.int32)                           # (RT, 1)
    half = T // 2
    l_eff = jnp.where(lane <= half, lane, lane - half)      # (1, T)
    m = (ii * l_eff) % T                                    # (RT, T)
    phi = m.astype(f32) * (two_pi / T)
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    qmask = ((lane >= 1) & (lane <= half - 1)).astype(f32)  # Im source ok
    rmask = (lane >= half + 1).astype(f32)                  # Im dest lanes
    P = cphi
    QR = -sphi * qmask + sphi * rmask

    def rolled(x):
        spec = jnp.dot(x, fmat_ref[:], preferred_element_type=f32)
        spec_sw = jnp.dot(x, fmatsw_ref[:], preferred_element_type=f32)
        return spec * P + spec_sw * QR

    sr = rolled(rr_c)
    se = rolled(e)
    sw_ = rolled(w)

    # validity: column 0 of the raw range row carries it (>=1mm build
    # floor); in-bounds arrives precomputed (depends on hc/wc)
    ok = jnp.minimum(R[:, 0:1] * 1e3, 1.0)                  # exact 0/1
    wsum = inb_col * ok

    out = _edge_render_tile(sr, se, sw_, g0_ref[:], g1_ref[:], g2_ref[:],
                            fs_col, wsum, cf_ref[:], max_range, ew_dtype)
    if pool_rows:
        # rotation-addressed resident pool (noise_mode="pool_rot"):
        # noise_ref is the SMEM (1, 1) shared per-step offset and pool_ref
        # the wrap-extended (rows + pad, B) pool — env g of this step reads
        # row (g + off) % rows via ONE contiguous dynamic slice (the pad
        # rows replicate the pool head, so the slice never wraps)
        tile_envs = raw.shape[0] // agents_per_env
        off = noise_ref[0, 0]
        s = jax.lax.rem(pl.program_id(0) * tile_envs + off,
                        jnp.int32(pool_rows))
        # Mosaic requires a statically-provable sublane alignment for the
        # dynamic slice start ("cannot statically prove that index in
        # dimension 0 is a multiple of 8", live round-5).  The wrapper
        # quantizes off to multiples of 16 (the bf16 packed-sublane
        # granularity) and tile_envs/pool_rows are multiples of 16, so s
        # is too — pl.multiple_of carries that proof to the compiler.
        s = pl.multiple_of(s, 16)
        noise_blk = pool_ref[pl.ds(s, tile_envs), :]
    else:
        noise_blk = noise_ref[:]
    # the megakernel's grid is 1-D over ROW tiles and its block carries the
    # full beam width, so its beam-tile index is always 0 (pl.program_id(0)
    # here is the ROW tile — using it masked every beam for tiles >= 1)
    out, hit_ref[:] = _noise_ttc_tile(
        out, noise_blk, vel_col, cos_ref[:], side_ref[:],
        agents_per_env, n_beams, ttc_thresh, beam_tile=0)
    if n_opp:
        out = _opp_raycast_tile(out, opp_ref[:], cos_ref[:], sin_ref[:],
                                n_opp)
    out_ref[:] = out


# The megakernel holds ~10 (rows, B) f32 intermediates live at once (taps,
# ramp, opp slab tests); at ROW_TILE=256 the opp-fused variant measured
# 18.8 MB of scoped VMEM against the chip's 16 MB limit (live round-5 OOM),
# so mega uses its own half-size row tile.
MEGA_ROW_TILE = 128


@functools.lru_cache(maxsize=None)
def _make_mega(max_range: float, ttc_thresh: float, agents_per_env: int,
               t_bins: int, n_opp: int = 0, ew_dtype="bfloat16",
               pool_rows: int = 0):
    a_n = agents_per_env
    # the half tile is only needed when the opp stage's extra live
    # intermediates are present; the plain mega fits (and measured ~1.5%
    # faster) at 256
    ROW_TILE = MEGA_ROW_TILE if n_opp else 256
    assert ROW_TILE % a_n == 0

    @jax.custom_batching.custom_vmap
    def mega(raw, dx, dy, f_s, i_f, inb, vel, fmat, fmat_sw, shift1, gmat,
             c_frac, noise, cosines, side_dist, sines, opp, pool):
        """Raw gathered texture rows -> finished noisy scan + iTTC flags.

        raw (K, 5T) (bf16 or f32 storage), per-row scalars dx/dy/f_s/i_f
        (float-encoded integer roll)/inb (in-bounds 0/1)/vel (K,), noise
        (E, B) with K == E * agents_per_env — or, with pool_rows set,
        noise (E, 1) int32 per-env row draws plus ``pool`` the
        wrap-extended resident pool (env g reads pool row
        (g + noise[0, 0]) % pool_rows in-kernel).  Returns (scan (K, B),
        hit (K,))."""
        k_n = raw.shape[0]
        T = t_bins
        b_n = c_frac.shape[0]
        dtype = jnp.float32
        assert raw.shape[1] == 5 * T, raw.shape
        assert k_n == noise.shape[0] * a_n

        g0m = gmat[:, :b_n]
        g1m = gmat[:, b_n:2 * b_n]
        g2m = gmat[:, 2 * b_n:]
        beam2 = lambda v: v[None, :].astype(dtype)
        # ONE packed per-row scalar operand (see _mega_kernel): 6 columns +
        # 2 zero-pad, one DMA stream and one upstream layout copy instead
        # of six of each
        scal = jnp.stack(
            [dx.astype(dtype), dy.astype(dtype), f_s.astype(dtype),
             i_f.astype(dtype), inb.astype(dtype), vel.astype(dtype),
             jnp.zeros_like(dx, dtype), jnp.zeros_like(dx, dtype)], axis=-1)

        grid = (pl.cdiv(k_n, ROW_TILE),)
        interpret = jax.default_backend() != "tpu"

        raw_spec = pl.BlockSpec((ROW_TILE, 5 * T), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((ROW_TILE, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        tt_spec = pl.BlockSpec((T, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        tap_spec = pl.BlockSpec((T, b_n), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        beam_spec = pl.BlockSpec((1, b_n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        if pool_rows:
            assert noise.dtype == jnp.int32 and noise.shape[1] == 1, noise
            assert pool.shape[0] >= pool_rows + ROW_TILE // a_n, \
                (pool.shape, pool_rows)
            assert pool_rows % 16 == 0 and (ROW_TILE // a_n) % 16 == 0, \
                (pool_rows, ROW_TILE, a_n)
            # one SHARED per-step offset: env 0's row draw (uniform on
            # [0, pool_rows) from its per-step key), quantized to
            # multiples of 16 so the in-kernel slice start is provably
            # sublane-aligned (Mosaic rejects unaligned dynamic starts;
            # pool_rows/16 distinct rotations per step remain)
            noise_op = jnp.reshape(noise[0, 0] & ~jnp.int32(15), (1, 1))
            noise_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
        else:
            noise_op = noise
            noise_spec = pl.BlockSpec((ROW_TILE // a_n, b_n),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
        in_specs = [raw_spec, scal_spec, tt_spec, tt_spec, tt_spec,
                    tap_spec, tap_spec, tap_spec, beam_spec, noise_spec,
                    beam_spec, beam_spec]
        operands = [raw, scal, fmat, fmat_sw, shift1, g0m, g1m,
                    g2m, beam2(c_frac), noise_op, beam2(cosines),
                    beam2(side_dist)]
        if n_opp:
            assert opp.shape == (k_n, 10 * n_opp)
            in_specs += [beam_spec,
                         pl.BlockSpec((ROW_TILE, 10 * n_opp),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)]
            operands += [beam2(sines), opp]
        if pool_rows:
            # resident block: constant index map -> fetched once, reused
            # across every grid step
            in_specs += [pl.BlockSpec(pool.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)]
            operands += [pool]
        out, hit = pl.pallas_call(
            functools.partial(_mega_kernel, max_range=max_range,
                              ttc_thresh=ttc_thresh, agents_per_env=a_n,
                              n_beams=b_n, t_bins=T, n_opp=n_opp,
                              ew_dtype=ew_dtype, pool_rows=pool_rows),
            out_shape=(jax.ShapeDtypeStruct((k_n, b_n), dtype),
                       jax.ShapeDtypeStruct((8, k_n), dtype)),
            grid=grid,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((ROW_TILE, b_n), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, ROW_TILE), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(*operands)
        return out, jnp.max(hit, axis=0)

    @mega.def_vmap
    def _vmap_rule(axis_size, in_batched, raw, dx, dy, f_s, i_f, inb, vel,
                   fmat, fmat_sw, shift1, gmat, c_frac, noise, cosines,
                   side_dist, sines, opp, pool):
        (rb, dxb, dyb, fb, ib, inbb, vb, fmb, fsb, shb, gb, cb, nb, cob,
         sib, snb, ob, poolb) = in_batched
        assert not any(jax.tree.leaves((fmb, fsb, shb, gb, cb, cob, sib,
                                        snb, poolb))), \
            "constants must not carry a batch axis"

        def mat(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

        raw_b = mat(raw, rb)
        e, k_n = raw_b.shape[:2]
        flat = lambda x, b: mat(x, b).reshape((e * k_n,))
        noise_b = mat(noise, nb)
        noise_b = noise_b.reshape((-1, noise_b.shape[-1]))
        opp_b = None
        if opp is not None:
            opp_b = mat(opp, ob)
            opp_b = opp_b.reshape((e * k_n, opp_b.shape[-1]))
        out, hit = mega(
            raw_b.reshape((e * k_n, raw_b.shape[-1])),
            flat(dx, dxb), flat(dy, dyb), flat(f_s, fb), flat(i_f, ib),
            flat(inb, inbb), flat(vel, vb), fmat, fmat_sw, shift1, gmat,
            c_frac, noise_b, cosines, side_dist, sines, opp_b, pool)
        return (out.reshape(e, k_n, out.shape[-1]),
                hit.reshape(e, k_n)), (True, True)

    return mega


def mega_edge_ttc(raw, dx, dy, f_s, i_f, inb, vel, fmat, fmat_sw, shift1,
                  gmat, c_frac, noise, cosines, side_dist,
                  max_range: float, ttc_thresh: float, agents_per_env: int,
                  t_bins: int, ew_dtype=jnp.bfloat16, sines=None, opp=None,
                  pool=None, pool_rows: int = 0):
    """One-launch fast-scan pipeline from raw gathered rows (see comment
    above).  ``fmat_sw`` must be fmat with its columns rotated by T/2
    (jnp.roll(fmat, -T//2, axis=1)) and ``shift1`` the one-lane circular
    shift matrix (eye rolled by one).  With ``opp`` (K, 10 * n_opp) slab
    scalars (+ the static beam ``sines``), the opponent ray cast runs
    in-kernel too."""
    n_opp = 0 if opp is None else opp.shape[-1] // 10
    return _make_mega(float(max_range), float(ttc_thresh),
                      int(agents_per_env), int(t_bins), n_opp,
                      jnp.dtype(ew_dtype).name, int(pool_rows))(
        raw, dx, dy, f_s, i_f, inb, vel, fmat, fmat_sw, shift1, gmat,
        c_frac, noise, cosines, side_dist, sines, opp, pool)
