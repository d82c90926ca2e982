"""Fast lidar: precomputed range texture + trilinear lookup.

This is the throughput-mode design the BASELINE north star prescribes: the
range field R(x, y, theta) is precomputed ONCE per map on device with the
exact sphere march, and each runtime beam becomes a handful of gathers +
lerps instead of ~35 data-dependent march iterations.  On this TPU, XLA's
element gather sustains ~144M lookups/s regardless of table size, so cutting
lookups/beam from ~35 to 8 is a direct ~4x; the Pallas lane-gather kernel
(ops/pallas_scan.py) lifts the within-row theta gathers to ~1G/s for the
rest.

Accuracy: trilinear interpolation of a range field is exact for planar walls
away from visibility discontinuities; near occlusion edges it blends
foreground/background ranges.  Use scan_mode="exact" for reference parity;
"fast" for RL throughput (tests pin the error distribution).
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.maps.loader import TrackMap
from red_gym_tpu.ops import scan as scan_ops


class RangeTexture(NamedTuple):
    """Precomputed ranges on a (rows x cols x theta_bins) pose grid.

    ``fmat``/``gmat`` serve the all-matmul fast path (trace_fast_mxu): the
    per-agent integer circular roll of the theta row is performed exactly in
    the DFT domain (constant rfft matrix -> per-agent phase twiddle ->
    constant matrix fusing the inverse transform with the one-hot beam
    shuffle), so the runtime scan contains no dynamic gathers at all beyond
    the 4 contiguous texture-row fetches."""

    rt: jnp.ndarray        # (Hc * Wc, T) ranges [m]; STORAGE dtype may be
                           # bfloat16 (cfg.rt_dtype) — compute upcasts
    valid: jnp.ndarray     # (Hc * Wc,) free-space mask (occupied rows are 0)
    hc: jnp.ndarray        # int32 rows
    wc: jnp.ndarray        # int32 cols
    cell: jnp.ndarray      # cell size [m] = stride * map resolution
    fmat: jnp.ndarray      # (T, T) packed real rfft: [Re 0..T/2 | Im 1..T/2-1]
    gmat: jnp.ndarray      # (T, 3B) packed irfft fused with the beam shuffle
    smat: jnp.ndarray      # (T, B) Lanczos-windowed trig evaluation at the
                           # static beam offsets (scan_interp="spectral")


def _texture_cache_path(tmap: TrackMap, cfg: SimConfig):
    """Content-addressed cache file for the marched (rt, valid) arrays.

    Keyed on the dt texture bytes + every config field the march reads, so
    edited maps or changed settings never hit a stale entry.  Cache dir:
    $RED_GYM_TPU_TEXTURE_CACHE, default ~/.cache/red_gym_tpu; set it to
    "0"/"off" to disable.
    """
    import hashlib
    import os

    root = os.environ.get("RED_GYM_TPU_TEXTURE_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".cache", "red_gym_tpu"))
    if root.lower() in ("0", "off", "none", ""):
        return None
    h = hashlib.sha256()
    h.update(b"rtex-v2|")   # build-recipe version (v2: 1mm valid-row floor)
    h.update(np.ascontiguousarray(np.asarray(tmap.dt)).tobytes())
    for v in (cfg.rt_pose_stride, cfg.rt_theta_bins, cfg.max_range, cfg.eps,
              float(np.asarray(tmap.resolution)),
              float(np.asarray(tmap.orig_x)), float(np.asarray(tmap.orig_y)),
              str(np.dtype(tmap.dt.dtype))):
        h.update(repr(v).encode())
    return os.path.join(root, f"rtex_{h.hexdigest()[:24]}.npz")


def build_range_texture(tmap: TrackMap, cfg: SimConfig,
                        batch_rows: int = 8) -> RangeTexture:
    """March every theta bin from every texture cell center (on device).

    Runs in row batches to bound memory; one-time cost per map (~seconds to
    tens of seconds depending on rt_pose_stride), memoized to disk by
    content hash (see _texture_cache_path) so repeated runs — multi-seed
    training sweeps, multi-process launches — pay it once per machine.
    """
    stride = cfg.rt_pose_stride
    t_bins = cfg.rt_theta_bins
    # texture extents from the PADDED dt shape (== true shape for unpadded
    # maps): padded cells are occupied, so their rows zero out and carry
    # valid=False — and equally-padded maps yield stackable textures.
    h, w = int(tmap.dt.shape[-2]), int(tmap.dt.shape[-1])
    hc = (h + stride - 1) // stride
    wc = (w + stride - 1) // stride
    res = float(tmap.resolution)
    cell = stride * res
    dtype = tmap.dt.dtype

    angles = jnp.asarray(
        np.arange(t_bins) * (2 * math.pi / t_bins), dtype=dtype)

    # texture cell centers in map-rotated coords -> world coords
    ox, oy = tmap.orig_x, tmap.orig_y
    oc, os_ = tmap.orig_c, tmap.orig_s

    def rows_to_world(r_idx, c_idx):
        x_rot = (c_idx.astype(dtype) + 0.5) * cell
        y_rot = (r_idx.astype(dtype) + 0.5) * cell
        x = x_rot * oc - y_rot * os_ + ox
        y = x_rot * os_ + y_rot * oc + oy
        return x, y

    cfg_march = cfg  # same eps/max_range semantics as the exact mode

    @jax.jit
    def do_rows(r0):
        r_idx = r0 + jnp.arange(batch_rows)[:, None]            # (B, Wc)
        c_idx = jnp.broadcast_to(jnp.arange(wc)[None, :], (batch_rows, wc))
        x, y = rows_to_world(r_idx, c_idx)
        origins = jnp.stack([x, y], axis=-1)                    # (B, Wc, 2)
        ranges = scan_ops.trace_angles(origins, angles, tmap, cfg_march)
        # valid rows must be strictly positive EVERYWHERE: the runtime
        # kernel reads validity off theta column 0 alone (no 128-wide
        # max-reduce over the gathered rows); 1 mm floor, below the
        # texture's error scale
        ranges = jnp.maximum(ranges, 1e-3)
        free = scan_ops.dt_lookup(x, y, tmap) > 0.0
        # cells whose center lies beyond the TRUE map extents must be
        # invalid: dt_lookup's OOB read wraps to dt[-1,-1] (the reference
        # numpy quirk), which is free on maps whose corner pixel is free —
        # that would mark garbage marched rows valid and bleed into scans
        # near the map edge
        cy = (r_idx.astype(dtype) + 0.5) * stride
        cx = (c_idx.astype(dtype) + 0.5) * stride
        free = free & (cy < tmap.height.astype(dtype)) \
                    & (cx < tmap.width.astype(dtype))
        return ranges * free[..., None].astype(dtype), free

    cache = _texture_cache_path(tmap, cfg)
    if cache is not None and os.path.exists(cache):
        with np.load(cache) as z:
            rt = jnp.asarray(z["rt"], dtype)   # cache holds full precision
            valid = jnp.asarray(z["valid"])
    else:
        rt_rows = []
        valid_rows = []
        for r0 in range(0, hc, batch_rows):
            rng, fr = do_rows(jnp.int32(r0))
            rt_rows.append(rng)
            valid_rows.append(fr)
        rt = jnp.concatenate(rt_rows, axis=0)[:hc].reshape(hc * wc, t_bins)
        valid = jnp.concatenate(valid_rows, axis=0)[:hc].reshape(hc * wc)
        if cache is not None:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = cache + f".{os.getpid()}.tmp.npz"  # .npz: savez keeps name
            np.savez(tmp, rt=np.asarray(rt), valid=np.asarray(valid))
            os.replace(tmp, cache)  # atomic: concurrent builders race safely

    # Constant beam-shuffle matrix: beam b's theta offset c_b = angle_b*T/2pi
    # split into integer kb and fraction gb; emat column t*B+b one-hots bin
    # (kb_b + t) mod T of the per-agent ROLLED theta row (see trace_fast_mxu).
    # kb MUST come from the same dtype arithmetic the kernel uses for gb, or
    # a beam whose c_b rounds across an integer gets a whole-bin offset.
    np_dtype = np.dtype(dtype)
    incr = cfg.fov / (cfg.num_beams - 1)
    angles = (-cfg.fov / 2.0 + np.arange(cfg.num_beams) * incr).astype(np_dtype)
    c_b = angles * np_dtype.type(t_bins / (2.0 * math.pi))
    kb = np.floor(c_b).astype(np.int64)
    b_n = cfg.num_beams
    emat = np.zeros((t_bins, 3 * b_n), dtype=np.float64)
    for t in range(3):
        emat[(kb + t) % t_bins, t * b_n + np.arange(b_n)] = 1.0

    # DFT-domain exact integer roll: fmat = real rfft basis; gmat = inverse
    # transform of the real/imag unit coefficients, fused with emat.  The
    # spectrum is PACKED to exactly T reals — [Re 0..T/2, Im 1..T/2-1] — by
    # dropping the DC and Nyquist imaginaries, which are identically zero
    # for real input and stay zero under integer-roll twiddles.  T = 128
    # keeps both matmul contraction dims exactly one MXU tile.
    f_bins = t_bins // 2 + 1
    rf = np.fft.rfft(np.eye(t_bins), axis=1)                  # (T, F)
    fmat = np.concatenate([rf.real, rf.imag[:, 1:-1]], axis=1)  # (T, T)
    r_basis = np.fft.irfft(np.eye(f_bins), n=t_bins, axis=1)  # (F, T)
    s_basis = np.fft.irfft(1j * np.eye(f_bins), n=t_bins, axis=1)
    gmat = np.concatenate([r_basis @ emat,
                           (s_basis @ emat)[1:-1]], axis=0)   # (T, 3B)

    # Spectral evaluation matrix: trig reconstruction of the (rolled) theta
    # row AT the static beam offsets c_b, with a Lanczos window damping the
    # Gibbs ringing at occlusion discontinuities.  Row layout matches the
    # packed spectrum: [Re 0..T/2 | Im 1..T/2-1].
    freqs = np.arange(f_bins)
    sigma = np.sinc(freqs / (t_bins // 2))                    # Lanczos window
    scale = np.where((freqs == 0) | (freqs == t_bins // 2), 1.0, 2.0) / t_bins
    wf = (sigma * scale)[:, None]                             # (F, 1)
    omega_c = (2.0 * math.pi / t_bins) * np.outer(freqs, c_b)  # (F, B)
    smat = np.concatenate([wf * np.cos(omega_c),
                           (-wf * np.sin(omega_c))[1:-1]], axis=0)  # (T, B)

    return RangeTexture(rt=rt.astype(cfg.rt_jdtype), valid=valid,
                        hc=jnp.asarray(hc, jnp.int32),
                        wc=jnp.asarray(wc, jnp.int32),
                        cell=jnp.asarray(cell, dtype),
                        fmat=jnp.asarray(fmat, dtype),
                        gmat=jnp.asarray(gmat, dtype),
                        smat=jnp.asarray(smat, dtype))


def stack_textures(rtexs):
    """Stack equal-shaped RangeTextures along a leading (per-env map) axis.

    The constant interpolation matrices (fmat/gmat/smat) are config-static
    and identical across maps, so they stay unbatched — see ``batch_axes``
    for the matching vmap in_axes spec."""
    first = rtexs[0]
    return RangeTexture(
        rt=jnp.stack([r.rt for r in rtexs]),
        valid=jnp.stack([r.valid for r in rtexs]),
        hc=jnp.stack([r.hc for r in rtexs]),
        wc=jnp.stack([r.wc for r in rtexs]),
        cell=jnp.stack([r.cell for r in rtexs]),
        fmat=first.fmat, gmat=first.gmat, smat=first.smat)


def batch_axes(axis: int = 0) -> "RangeTexture":
    """vmap in_axes spec for a stacked RangeTexture."""
    return RangeTexture(rt=axis, valid=axis, hc=axis, wc=axis, cell=axis,
                        fmat=None, gmat=None, smat=None)


def _use_pallas(cfg: SimConfig) -> bool:
    # "auto" currently resolves to the XLA path: A/B on the full env step
    # showed the fused Pallas epilogue ~8% slower end-to-end because it acts
    # as a fusion barrier for the scan's elementwise consumers (see
    # docs/performance.md).  It remains selectable for pipelines that feed
    # the scan straight into a matmul.
    return cfg.scan_backend == "pallas"


def _compute_dtype(rtex: RangeTexture):
    """Interpolation compute dtype: the full-precision build dtype (fmat's),
    independent of the possibly-bfloat16 rt STORAGE dtype."""
    return rtex.fmat.dtype


def _cells_and_theta(pose, tables, tmap, rtex: RangeTexture, cfg: SimConfig,
                     midx=None):
    """Shared geometry for the fast lookups: bilinear cells + theta coords.

    Returns (rows (..., 4), wgt (..., 4), u (..., B)).  With ``midx`` and a
    map-stacked texture, rows are offset into the flat (M*Hc*Wc, T) table."""
    t_bins = cfg.rt_theta_bins
    dtype = _compute_dtype(rtex)
    two_pi = 2.0 * math.pi

    phi = pose[..., 2:3] + tables.scan_angles                   # (..., B)
    u = jnp.mod(phi, two_pi) * (t_bins / two_pi)

    if midx is None:
        ox, oy, oc, osn = tmap.orig_x, tmap.orig_y, tmap.orig_c, tmap.orig_s
        cell, wc, hc = rtex.cell, rtex.wc, rtex.hc
        row_base = 0
    else:
        ox, oy, oc, osn = (tmap.orig_x[midx], tmap.orig_y[midx],
                           tmap.orig_c[midx], tmap.orig_s[midx])
        cell, wc, hc = rtex.cell[midx], rtex.wc[midx], rtex.hc[midx]
        assert rtex.rt.ndim == 3, "midx requires a map-stacked RangeTexture"
        row_base = midx * rtex.rt.shape[-2]

    x_t = pose[..., 0] - ox
    y_t = pose[..., 1] - oy
    gx = (x_t * oc + y_t * osn) / cell - 0.5
    gy = (-x_t * osn + y_t * oc) / cell - 0.5
    if cfg.rt_spatial == "nearest1":
        # single rounded cell: ONE texture-row gather instead of four —
        # the row gather is the hottest kernel of the whole env step
        rr = jnp.round(gy).astype(jnp.int32)[..., None]        # (..., 1)
        cc = jnp.round(gx).astype(jnp.int32)[..., None]
        wgt = jnp.ones(rr.shape, dtype)
    else:
        c0 = jnp.floor(gx).astype(jnp.int32)
        r0 = jnp.floor(gy).astype(jnp.int32)
        fx = (gx - c0).astype(dtype)
        fy = (gy - r0).astype(dtype)

        rr = jnp.stack([r0, r0, r0 + 1, r0 + 1], axis=-1)
        cc = jnp.stack([c0, c0 + 1, c0, c0 + 1], axis=-1)
        wgt = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                         fy * (1 - fx), fy * fx], axis=-1).astype(dtype)
    in_bounds = (rr >= 0) & (rr < hc) & (cc >= 0) & (cc < wc)
    rows = jnp.clip(rr, 0, hc - 1) * wc + jnp.clip(cc, 0, wc - 1)
    if midx is not None:
        rows = rows + row_base

    # NB: weights here cover in-bounds only; callers must still drop
    # invalid (occupied-center) cells.  trace_fast_mxu derives that from the
    # gathered rows themselves (invalid rows are all-zero) — a per-element
    # gather of rtex.valid costs ~1 ms/step at 16k envs on TPU.
    wgt = wgt * in_bounds.astype(dtype)
    return rows, wgt, u


def trace_fast_mxu(pose, tables: scan_ops.ScanTables, tmap: TrackMap,
                   rtex: RangeTexture, cfg: SimConfig, midx=None):
    """MXU formulation of the fast scan: contiguous gathers + constant matmuls.

    Decompose every beam's theta coordinate u_b = s + c_b where s depends
    only on the agent pose and c_b = scan_angle_b * T/2pi is static:

      1. gather the 4 surrounding texture ROWS (contiguous slices — the fast
         XLA gather path) and blend them spatially (bilinear weights);
      2. circular-roll the blended theta row by the integer i_s = floor(s) —
         done EXACTLY in the DFT domain: one constant rfft matmul, a
         per-agent phase twiddle (2F trig values), and the inverse transform
         pre-fused with step 3's constant matrix;
      3. the per-beam theta gather on the rolled row has STATIC indices
         (kb_b + t) mod T, t in {0,1,2} — a constant one-hot matmul;
      4. linear theta interpolation = elementwise blend of the three
         shuffled copies with weights from alpha_b = frac(s) + frac(c_b).

    Identical interpolation semantics to trace_fast (bilinear x linear), up
    to DFT-roundtrip rounding, with no per-step kernel materialization and
    no dynamic gathers beyond the 4 row fetches — ~20x faster than a (B, T)
    triangular-kernel einsum which round-trips a batch x B x T intermediate
    through HBM, and ~100x faster than per-element gathers.
    """
    t_bins = cfg.rt_theta_bins
    b_n = cfg.num_beams
    f_bins = t_bins // 2 + 1
    dtype = _compute_dtype(rtex)
    two_pi = 2.0 * math.pi
    rows, wgt, _ = _cells_and_theta(pose, tables, tmap, rtex, cfg, midx)

    # per-agent theta decomposition (beam offsets enter via constant gmat)
    s = jnp.mod(pose[..., 2], two_pi) * (t_bins / two_pi)       # (...,)
    i_s = jnp.floor(s)
    f_s = (s - i_s).astype(dtype)
    i_i = i_s.astype(jnp.int32)
    # s can round up to exactly T (theta just under 2pi): wrap, don't clamp
    i_i = jnp.where(i_i >= t_bins, i_i - t_bins, i_i)

    rt2d = rtex.rt.reshape((-1, t_bins)) if rtex.rt.ndim == 3 else rtex.rt
    rows_v = jnp.take(rt2d, rows, axis=0)                       # (..., 4, T)
    # cell validity from the rows themselves: invalid (occupied-center)
    # cells were zeroed at build time and valid rows are >= 1mm EVERYWHERE
    # (build-time floor), so column 0 alone carries validity — a 128-wide
    # max-reduce here re-read the whole 67 MB gather output (0.6 ms/step
    # at 16k envs)
    cell_ok = rows_v[..., 0] > 0                                # (..., 4)
    wgt = wgt * cell_ok.astype(dtype)
    if cfg.rt_spatial == "nearest":
        # single best valid cell: the theta row is a REAL marched scan from
        # one quantized pose, so occlusion edges never mix foreground and
        # background ranges spatially (see SimConfig.rt_spatial)
        wgt = jax.nn.one_hot(jnp.argmax(wgt, axis=-1), 4, dtype=dtype) \
            * (jnp.max(wgt, axis=-1, keepdims=True) > 0).astype(dtype)
    wsum = jnp.sum(wgt, axis=-1, keepdims=True)
    wnorm = wgt / jnp.maximum(wsum, jnp.asarray(1e-12, dtype))
    # explicit multiply-reduce (not dot_general) fuses with the gather;
    # a bfloat16 rows_v upcasts against the f32 weights right here
    blended = jnp.sum(rows_v.astype(dtype) * wnorm[..., :, None],
                      axis=-2)                                  # (..., T)

    # NB: bf16 matmul INPUTS were measured at only +1.5% end-to-end while
    # costing ~5x compile time and extra contract error — the constant
    # matmuls stay full precision; only the rt STORAGE is bf16
    spec = jnp.matmul(blended, rtex.fmat,
                      preferred_element_type=dtype)             # (..., T)
    re, im = spec[..., :f_bins], spec[..., f_bins:]             # (...,F),(...,F-2)

    if cfg.scan_interp == "spectral":
        # full REAL-valued roll in the DFT phase; beams evaluated by one
        # constant (windowed) trig matrix — no per-beam elementwise tail.
        freqs = jnp.arange(f_bins, dtype=s.dtype)
        m = jnp.mod(freqs * s[..., None], float(t_bins))
        phi = m.astype(dtype) * (two_pi / t_bins)               # (..., F)
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        zero = jnp.zeros_like(re[..., 0:1])
        im_full = jnp.concatenate([zero, im, zero], axis=-1)
        re_r = re * cphi - im_full * sphi
        im_r = (re * sphi + im_full * cphi)[..., 1:-1]
        spec_r = jnp.concatenate([re_r, im_r], axis=-1)         # (..., T)
        out = jnp.matmul(spec_r, rtex.smat,
                         preferred_element_type=dtype)          # (..., B)
        out = jnp.where(wsum[..., 0:1] > 0, out, 0.0)
        return jnp.clip(out, 0.0, cfg.max_range)

    # exact integer roll by i_i in the packed DFT domain.  Phases come from
    # integer modular arithmetic so f=T/2 lands on exactly {0, pi} and its
    # imaginary part stays (numerically) zero — the packed layout is closed
    # under integer-roll twiddles.
    m = jnp.mod(i_i[..., None] * jnp.arange(f_bins, dtype=jnp.int32), t_bins)
    phi = m.astype(dtype) * (two_pi / t_bins)                   # (..., F)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    zero = jnp.zeros_like(re[..., 0:1])
    im_full = jnp.concatenate([zero, im, zero], axis=-1)        # (..., F)
    re_r = re * cphi - im_full * sphi
    im_r = (re * sphi + im_full * cphi)[..., 1:-1]
    spec_r = jnp.concatenate([re_r, im_r], axis=-1)             # (..., T)

    c_frac = jnp.mod(tables.scan_angles * (t_bins / two_pi), 1.0).astype(dtype)

    if _use_pallas(cfg):
        # fused shuffle-matmul + blend: the (..., 3B) intermediate never
        # touches HBM (ops/pallas_scan.py)
        from red_gym_tpu.ops import pallas_scan

        batch = spec_r.shape[:-1]
        out = pallas_scan.theta_shuffle_blend(
            spec_r.reshape((-1, t_bins)), f_s.reshape((-1,)),
            wsum[..., 0].reshape((-1,)), rtex.gmat, c_frac, cfg.max_range)
        return out.reshape(batch + (b_n,))

    g = jnp.matmul(spec_r, rtex.gmat,
                   preferred_element_type=dtype)                # (..., 3B)
    g0, g1, g2 = g[..., :b_n], g[..., b_n:2 * b_n], g[..., 2 * b_n:]

    alpha = f_s[..., None] + c_frac                              # (..., B) in [0,2)
    w0 = jnp.maximum(1.0 - alpha, 0.0)
    w2 = jnp.maximum(alpha - 1.0, 0.0)
    w1 = 1.0 - w0 - w2
    out = w0 * g0 + w1 * g1 + w2 * g2

    out = jnp.where(wsum[..., 0:1] > 0, out, 0.0)
    return jnp.clip(out, 0.0, cfg.max_range)


def trace_fast(pose, tables: scan_ops.ScanTables, tmap: TrackMap,
               rtex: RangeTexture, cfg: SimConfig, midx=None):
    """Scan via the range texture: pose (..., 3) -> (..., num_beams).

    Bilinear over the 4 surrounding texture cells (invalid cells dropped and
    weights renormalized) x linear over the 2 neighboring theta bins —
    element-gather formulation (8 gathers/beam).  Prefer trace_fast_mxu on
    TPU; this variant is the readable definition both are tested against.
    """
    t_bins = cfg.rt_theta_bins
    dtype = _compute_dtype(rtex)
    rows, wgt, u = _cells_and_theta(pose, tables, tmap, rtex, cfg, midx)
    wgt = wgt * jnp.take(rtex.valid.reshape((-1,)), rows).astype(dtype)
    if cfg.rt_spatial == "nearest":
        wgt = jax.nn.one_hot(jnp.argmax(wgt, axis=-1), 4, dtype=dtype) \
            * (jnp.max(wgt, axis=-1, keepdims=True) > 0).astype(dtype)
    wsum = jnp.sum(wgt, axis=-1, keepdims=True)

    i0 = jnp.floor(u).astype(jnp.int32) % t_bins
    i1 = (i0 + 1) % t_bins
    a = (u - jnp.floor(u)).astype(dtype)[..., None, :]           # (..., 1, B)

    flat0 = rows[..., :, None] * t_bins + i0[..., None, :]       # (..., 4, B)
    flat1 = rows[..., :, None] * t_bins + i1[..., None, :]
    rt_flat = rtex.rt.reshape((-1,))
    v0 = jnp.take(rt_flat, flat0).astype(dtype)
    v1 = jnp.take(rt_flat, flat1).astype(dtype)
    v = v0 * (1 - a) + v1 * a                                    # (..., 4, B)

    num = jnp.sum(v * wgt[..., :, None], axis=-2)                # (..., B)
    out = num / jnp.maximum(wsum, jnp.asarray(1e-12, dtype))
    # outside the texture / inside walls: fall back to 0 (collided anyway)
    out = jnp.where(wsum[..., 0:1] > 0, out, 0.0)
    return jnp.clip(out, 0.0, cfg.max_range)
