"""Pallas TPU kernel fusing the per-row pre-scan state chain.

After the round-5 scan megakernel, the profiler shows the default step's
remaining cost is ~1.4 ms of small-kernel dust: the steer-delay line, PID,
the RK4 single-track integration, yaw wrap, and the fast-scan geometry
prep (cell lookup + theta decomposition) each run as dozens of 9-40 us
XLA kernels on (E, A) state fields, plus the (E, A) -> (K,) layout copies
between them.  Every one of those ops is pure elementwise math per
(env, agent) row — exactly one Pallas launch's worth of work.

This kernel runs the whole chain in ONE launch on a fields-on-sublanes
layout: the packed input is (16, K) float32 with one STATE FIELD per
sublane row and all K = envs * agents rows on lanes (full 8x128 VPU
utilization; the (K, field) layout would use 1 lane in 128).  The body
calls the SAME jnp functions the XLA path uses (ops/dynamics.py,
ops/integrate.py) on (1, K)-shaped rows — one formula, two launch
configurations, so parity is associativity-exact.

Packed input rows:   0-6  x (x, y, steer, vel, yaw, yaw_rate, slip)
                     7-8  steering delay line (newest first; delay == 2)
                     9    steer_cnt (as float; counts saturate at 2)
                     10   raw desired steer   (action 0)
                     11   desired speed       (action 1)
                     12-15 unused (pad to a 16-sublane tile)
Packed output rows:  0-6  x' (yaw wrapped)    7-8 delay line'   9 cnt'
                     10 dx   11 dy   12 f_s   13 i_f   14 in_bounds
                     15 texture row index (float32 — exact to 2^24,
                        far above any stacked-texture row count)

Scope (callers gate on `supported()`): fast scan / nearest1 / float32 /
steer_delay == 2 / default PID / single map (midx None) / scalar vehicle
params.  Everything else falls back to the unfused XLA chain unchanged.

Reference parity: the chain reproduces RaceCar.update_pose
(reference gym/f110_gym/envs/base_classes.py:254-407) exactly as
env.sim_step's XLA path does — same delay-line semantics, same PID, same
RK4 stage ordering.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from red_gym_tpu.config import Integrator, VehicleParams
from red_gym_tpu.ops import dynamics as dyn, integrate

LANE_TILE = 4096

_VEH_FIELDS = VehicleParams._fields  # 18


def _kernel(pk_ref, veh_ref, geo_f_ref, geo_i_ref, out_ref, *,
            timestep, integrator, t_bins, two_pi_bins):
    f32 = jnp.float32
    pk = pk_ref[:]                                           # (16, LT)
    row = lambda i: pk[i:i + 1, :]                           # (1, LT)

    p = VehicleParams(*(veh_ref[0, i] for i in range(len(_VEH_FIELDS))))

    # steering delay line, depth 2 (env._steer_delay; reference
    # base_classes.py:268-276)
    scnt = row(9)
    filled = scnt >= 2.0
    steer = jnp.where(filled, row(8), 0.0)
    sb0p, sb1p = row(10), row(7)                             # push raw
    scntp = jnp.minimum(scnt + 1.0, 2.0)

    accl, sv = dyn.pid(row(11), steer, row(3), row(2),
                       p.sv_max, p.a_max, p.v_max, p.v_min)
    xt = tuple(row(i) for i in range(7))
    xt = integrate.integrate_t(integrator, dyn.vehicle_dynamics_st_t,
                               xt, sv, accl, timestep, p)
    yaw = integrate.wrap_yaw(xt[4])
    xt = xt[:4] + (yaw,) + xt[5:]

    # fast-scan geometry prep (scan_fast._cells_and_theta, nearest1 + the
    # theta decomposition of trace_fast_mxu) — identical op order
    ox, oy = geo_f_ref[0, 0], geo_f_ref[0, 1]
    oc, osn = geo_f_ref[0, 2], geo_f_ref[0, 3]
    cell = geo_f_ref[0, 4]
    hc, wc = geo_i_ref[0, 0], geo_i_ref[0, 1]
    x_t = xt[0] - ox
    y_t = xt[1] - oy
    gx = (x_t * oc + y_t * osn) / cell - 0.5
    gy = (-x_t * osn + y_t * oc) / cell - 0.5
    rr = jnp.round(gy).astype(jnp.int32)
    cc = jnp.round(gx).astype(jnp.int32)
    inb = ((rr >= 0) & (rr < hc) & (cc >= 0) & (cc < wc)).astype(f32)
    rows = (jnp.clip(rr, 0, hc - 1) * wc
            + jnp.clip(cc, 0, wc - 1)).astype(f32)
    cxr = (rr.astype(f32) + 0.5) * cell
    cxc = (cc.astype(f32) + 0.5) * cell
    dx = xt[0] - (cxc * oc - cxr * osn + ox)
    dy = xt[1] - (cxc * osn + cxr * oc + oy)

    s = jnp.mod(yaw, 2.0 * math.pi) * two_pi_bins
    i_s = jnp.floor(s)
    f_s = s - i_s
    i_i = jnp.where(i_s >= t_bins, i_s - t_bins, i_s)

    out_ref[:] = jnp.concatenate(
        list(xt) + [sb0p, sb1p, scntp, dx, dy, f_s, i_i, inb, rows], axis=0)


@functools.lru_cache(maxsize=None)
def _make(timestep: float, integrator: Integrator, t_bins: int):
    two_pi_bins = t_bins / (2.0 * math.pi)

    @jax.custom_batching.custom_vmap
    def prestep(x, steer_buf, steer_cnt, actions, veh, geo_f, geo_i):
        """x (A, 7), steer_buf (A, 2), steer_cnt (A,), actions (A, 2),
        veh (1, 24) f32, geo_f (1, 8) f32, geo_i (1, 8) int32 ->
        TUPLE of 16 (A,) float32 rows packed as in the module docstring
        (per-field outputs keep every consumer slice a contiguous view —
        a single (16, A) output forced a materialized transpose under
        vmap)."""
        k_n = x.shape[0]
        f32 = jnp.float32
        pk = jnp.concatenate(
            [x.T.astype(f32),
             steer_buf.T.astype(f32),
             steer_cnt.astype(f32)[None, :],
             actions.T.astype(f32),
             jnp.zeros((4, k_n), f32)], axis=0)              # (16, K)

        grid = (pl.cdiv(k_n, LANE_TILE),)
        interpret = jax.default_backend() != "tpu"
        out = pl.pallas_call(
            functools.partial(_kernel, timestep=timestep,
                              integrator=integrator, t_bins=t_bins,
                              two_pi_bins=two_pi_bins),
            out_shape=jax.ShapeDtypeStruct((16, k_n), f32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((16, LANE_TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 24), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((16, LANE_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(pk, veh, geo_f, geo_i)
        return tuple(out[i] for i in range(16))

    @prestep.def_vmap
    def _rule(axis_size, in_batched, x, steer_buf, steer_cnt, actions,
              veh, geo_f, geo_i):
        xb, sbb, scb, ab, vb, gfb, gib = in_batched
        assert not (vb or gfb or gib), \
            "params/geometry must not carry a batch axis"
        e = axis_size

        def mat(v, batched):
            return v if batched else jnp.broadcast_to(v, (e,) + v.shape)

        x_b = mat(x, xb)                                     # (E, A, 7)
        a_n = x_b.shape[1]
        out = prestep(
            x_b.reshape(e * a_n, 7),
            mat(steer_buf, sbb).reshape(e * a_n, -1),
            mat(steer_cnt, scb).reshape(e * a_n),
            mat(actions, ab).reshape(e * a_n, 2),
            veh, geo_f, geo_i)                               # 16 x (E*A,)
        # each field reshape is a CONTIGUOUS view of one kernel-output row
        # (no transpose — a packed (E, 16, A) return forced a materialized
        # moveaxis and strided consumer slices, measured -4.7% on chip)
        return tuple(f.reshape(e, a_n) for f in out), (True,) * 16

    return prestep


def supported(cfg, params, midx) -> bool:
    """True iff this config/params combination is in the fused kernel's
    scope (see module docstring); callers fall back to the XLA chain
    otherwise."""
    from red_gym_tpu.ops import scan_fast

    if not (cfg.scan_mode == "fast" and cfg.rt_spatial == "nearest1"
            and cfg.dtype == "float32" and cfg.steer_delay == 2
            and cfg.speed_controller is None
            and scan_fast.use_megakernel(cfg)
            and midx is None and params.rtex is not None
            and params.rtex.rt.ndim == 2):
        return False
    return all(jnp.ndim(getattr(params.vehicle, f)) == 0
               for f in _VEH_FIELDS)


def pack_rows(params, cfg):
    """(veh (1, 24) f32, geo_f (1, 8) f32, geo_i (1, 8) int32) operand rows
    for `prestep` — runtime values (update_params stays live)."""
    f32 = jnp.float32
    veh = jnp.stack([jnp.asarray(getattr(params.vehicle, f), f32)
                     for f in _VEH_FIELDS] + [jnp.zeros((), f32)] * 6
                    )[None, :]                               # (1, 24)
    t = params.tmap
    r = params.rtex
    geo_f = jnp.stack([jnp.asarray(t.orig_x, f32), jnp.asarray(t.orig_y, f32),
                       jnp.asarray(t.orig_c, f32), jnp.asarray(t.orig_s, f32),
                       jnp.asarray(r.cell, f32), jnp.zeros((), f32),
                       jnp.zeros((), f32), jnp.zeros((), f32)])[None, :]
    i32 = jnp.int32
    geo_i = jnp.stack([jnp.asarray(r.hc, i32), jnp.asarray(r.wc, i32),
                       jnp.zeros((), i32), jnp.zeros((), i32),
                       jnp.zeros((), i32), jnp.zeros((), i32),
                       jnp.zeros((), i32), jnp.zeros((), i32)])[None, :]
    return veh, geo_f, geo_i


def prestep(cfg, x, steer_buf, steer_cnt, actions, veh, geo_f, geo_i):
    """Fused steer-delay + PID + RK4 + yaw wrap + scan-geometry prep.

    Returns the packed (16, A) output (module docstring); under vmap the
    custom rule collapses (env, agent) into the lane axis and runs ONE
    kernel over all rows."""
    return _make(float(cfg.timestep), cfg.integrator,
                 int(cfg.rt_theta_bins))(
        x, steer_buf, steer_cnt, actions, veh, geo_f, geo_i)
