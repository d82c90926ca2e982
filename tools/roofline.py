"""MFU / roofline accounting for the env step (VERDICT r4 item 3).

Three measurement tiers, each robust to the relayed-TPU environment:

1. **XLA cost analysis** — ``compiled.cost_analysis()`` of the full jitted
   scan-of-steps gives the compiler's own FLOP and HBM-byte counts.
   Dividing by the measured wall time and the chip peaks yields achieved
   %MXU and %HBM-BW — upper-bound utilization numbers that do not depend
   on the profiler working through the relay.
2. **Profiler per-kernel table** (``--profile``) — a jax.profiler trace
   parsed from the xplane proto (tensorboard_plugin_profile), aggregating
   device-side event durations by kernel. Best-effort: the axon relay may
   not ship device planes; the tool says so instead of failing.
3. **Stub ablation** (``--ablate``) — marginal ms/step of each phase by
   re-tracing the step with that phase monkeypatched out of the library
   (noise off, iTTC skipped, opponent raycast skipped, SAT skipped, scan
   replaced by zeros). The honest attribution method of round 2
   (docs/performance.md "Where a step goes"), rerun per mode.

Usage:
    python tools/roofline.py [--mode default|pool|fusedpool|ultra|...]
        [--envs 16384] [--steps 120] [--profile] [--ablate] [--json out]

Chip peaks default to TPU v5e (one chip): 197 TFLOP/s bf16 matmul,
99 TFLOP/s f32-equivalent (XLA DEFAULT precision runs f32 matmuls as
bf16x3 passes; the flop COUNT below is algebraic, so %MXU is quoted
against the bf16 peak as an optimistic bound and against bf16/3 as the
pessimistic one), 819 GB/s HBM. Override with --peak-tflops / --peak-gbs.
"""

import argparse
import dataclasses
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: mode configs + measure)


def _build_run(cfg, n_envs, steps):
    """The bench's scan-of-steps program (identical consumption contract:
    obs.scans is a data dependency of the forced output)."""
    import jax
    import jax.numpy as jnp

    from red_gym_tpu import env as envlib
    from red_gym_tpu.assets import example_map_yaml

    params = envlib.make_params(
        cfg, os.environ.get("BENCH_MAP") or example_map_yaml(), ".png")
    start = envlib.staggered_start_poses(cfg.num_agents)
    poses = jnp.tile(jnp.asarray(start[:cfg.num_agents], jnp.float32),
                     (n_envs, 1, 1))
    init = jax.jit(jax.vmap(lambda po, k: envlib.init_state(cfg, po, k)))
    states = init(poses, jax.random.split(jax.random.PRNGKey(0), n_envs))

    def run(params, states, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            steer = 0.4 * jax.random.uniform(ka, (n_envs, cfg.num_agents),
                                             jnp.float32, -1.0, 1.0)
            speed = jnp.full((n_envs, cfg.num_agents), 3.0, jnp.float32)
            act = jnp.stack([steer, speed], axis=-1)
            s, obs, r, d, _ = jax.vmap(
                lambda ss, aa: envlib.step(cfg, params, ss, aa))(s, act)
            return (s, k), (d, jnp.sum(obs.scans))
        (s, _), (dones, ssum) = jax.lax.scan(
            body, (states, key), None, length=steps)
        return s, dones, ssum

    return run, params, states


def _force(out):
    import jax.numpy as jnp
    s, dones, ssum = out
    return float(jnp.sum(s.x) + jnp.sum(ssum))


def measure_mode(cfg, n_envs, steps, repeats=3):
    """(ms/step, cost_analysis dict) for the full scan-of-steps program."""
    import jax

    run, params, states = _build_run(cfg, n_envs, steps)
    jitted = jax.jit(run)
    lowered = jitted.lower(params, states, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    except Exception as exc:  # relay backends may not implement it
        ca = {"error": str(exc)}
    _force(compiled(params, states, jax.random.PRNGKey(1)))  # warm
    best = float("inf")
    for i in range(repeats):
        t0 = time.time()
        _force(compiled(params, states, jax.random.PRNGKey(2 + i)))
        best = min(best, time.time() - t0)
    return best * 1e3 / steps, ca, compiled


def profile_kernels(cfg, n_envs, steps, top=25):
    """Best-effort per-kernel device times from a jax.profiler trace."""
    import jax

    run, params, states = _build_run(cfg, n_envs, steps)
    jitted = jax.jit(run)
    _force(jitted(params, states, jax.random.PRNGKey(1)))  # compile outside
    tmp = tempfile.mkdtemp(prefix="rgt_roofline_")
    jax.profiler.start_trace(tmp)
    _force(jitted(params, states, jax.random.PRNGKey(9)))
    jax.profiler.stop_trace()

    pbs = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        return None, "no xplane.pb produced"
    xplane_pb2 = None
    for mod in ("tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        return None, "no xplane proto module available"
    space = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as f:
        space.ParseFromString(f.read())
    device_planes = [p for p in space.planes
                     if "TPU" in p.name or "/device:" in p.name.lower()
                     or "Device" in p.name]
    if not device_planes:
        return None, (f"no device plane in trace (planes: "
                      f"{[p.name for p in space.planes]})")
    agg = defaultdict(float)
    for plane in device_planes:
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                agg[emeta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    # async DMA spans (copy-start/slice-start) overlap compute — their
    # durations measure waiting, not exclusive time — and the outer
    # while/jit wrappers double-count everything inside them; keep the
    # COMPUTE events (fusions, custom calls, dots) for the exclusive table
    skip = ("copy-", "slice-start", "%while", "jit_", "dynamic-update-slice",
            "all-reduce-start")
    rows = sorted(((k, v) for k, v in agg.items()
                   if not any(s in k for s in skip)),
                  key=lambda kv: -kv[1])[:top]
    return rows, None


# ---------------------------------------------------------------------------
# Stub ablation: marginal phase times by monkeypatching library internals
# ---------------------------------------------------------------------------

def _ablation_variants():
    """{phase: contextmanager} — each stubs ONE phase out of env.step."""
    import contextlib

    import jax.numpy as jnp

    from red_gym_tpu import env as envlib
    from red_gym_tpu.ops import agent_scan, collision as col, scan_fast

    @contextlib.contextmanager
    def _patched(obj, name, repl):
        orig = getattr(obj, name)
        setattr(obj, name, repl)
        try:
            yield
        finally:
            setattr(obj, name, orig)

    def no_opp_raycast():
        return _patched(agent_scan, "ray_cast_all_opponents",
                        lambda poses, scans, verts, tables: scans)

    def no_sat():
        return _patched(
            col, "pairwise_hits_from_poses",
            lambda poses, length, width: jnp.zeros(poses.shape[:-1],
                                                   poses.dtype))

    def no_scan():
        def zero_scan(pose, tables, tmap, rtex, cfg, midx=None,
                      fused_ttc=None):
            z = jnp.zeros(pose.shape[:-1] + (cfg.num_beams,), pose.dtype)
            if fused_ttc is not None:
                return z, jnp.zeros(pose.shape[:-1], pose.dtype)
            return z
        return _patched(scan_fast, "trace_fast_mxu", zero_scan)

    def no_ttc():
        return _patched(agent_scan, "check_ttc",
                        lambda scans, vel, tables, thr:
                        jnp.zeros(vel.shape, bool))

    del envlib
    return {
        "opponent raycast": no_opp_raycast,
        "body SAT": no_sat,
        "iTTC (unfused path only)": no_ttc,
        "whole lidar (scan+noise+ttc consumers)": no_scan,
    }


def ablate(cfg, n_envs, steps, base_ms):
    rows = []
    for phase, ctx in _ablation_variants().items():
        with ctx():
            ms, _, _ = measure_mode(cfg, n_envs, steps, repeats=2)
        rows.append((phase, base_ms - ms, ms))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fusedpool",
                    help=f"one of {sorted(bench._MODE_LABELS)}")
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--noise-off", action="store_true",
                    help="additionally measure scan_noise_std=0 (noise "
                         "marginal incl. the fused path)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 matmul peak of one chip [TFLOP/s]")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="HBM bandwidth peak of one chip [GB/s]")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from red_gym_tpu.utils import platform as _platform
    _platform.apply()
    import jax

    cfg = bench.make_cfg(args.mode)
    out = {"mode": args.mode, "envs": args.envs, "steps": args.steps,
           "backend": jax.default_backend()}

    ms, ca, _ = measure_mode(cfg, args.envs, args.steps)
    rate = args.envs / (ms * 1e-3)
    out["ms_per_step"] = round(ms, 4)
    out["env_steps_per_s"] = round(rate, 1)
    print(f"[{args.mode}] {ms:.3f} ms/step = {rate/1e6:.2f}M env-steps/s "
          f"({args.envs} envs, backend={jax.default_backend()})")

    if isinstance(ca, dict) and "flops" in ca:
        flops_step = ca["flops"] / args.steps
        bytes_step = ca.get("bytes accessed", 0.0) / args.steps
        mxu_opt = flops_step / (ms * 1e-3) / (args.peak_tflops * 1e12)
        mxu_pess = 3 * mxu_opt  # f32 matmuls run as bf16x3 passes
        hbm = bytes_step / (ms * 1e-3) / (args.peak_gbs * 1e9)
        out["cost_analysis"] = {
            "flops_per_step": flops_step, "hbm_bytes_per_step": bytes_step,
            "pct_mxu_bf16peak": round(100 * mxu_opt, 2),
            "pct_mxu_if_f32x3": round(100 * mxu_pess, 2),
            "pct_hbm_bw": round(100 * hbm, 2),
        }
        print(f"  XLA cost analysis: {flops_step/1e9:.2f} GFLOP/step, "
              f"{bytes_step/1e6:.1f} MB HBM/step")
        print(f"  => achieved {100*mxu_opt:.1f}% of bf16 MXU peak "
              f"({100*mxu_pess:.1f}% if all matmuls pay the f32 3-pass), "
              f"{100*hbm:.1f}% of HBM BW")
    else:
        print(f"  cost_analysis unavailable: {ca}")
        out["cost_analysis"] = None

    if args.profile:
        rows, err = profile_kernels(cfg, args.envs, args.steps)
        if rows is None:
            print(f"  profiler per-kernel table unavailable: {err}")
            out["profile"] = {"error": err}
        else:
            total = sum(t for _, t in rows)
            print(f"  top kernels (device ms over {args.steps} steps; "
                  f"top-25 total {total:.1f} ms):")
            for name, t_ms in rows:
                print(f"    {t_ms/args.steps:8.4f} ms/step  {name[:100]}")
            out["profile"] = [
                {"kernel": n, "ms_per_step": round(t / args.steps, 4)}
                for n, t in rows]

    if args.ablate:
        print("  marginal phase costs (phase stubbed out, re-jitted):")
        rows = ablate(cfg, args.envs, args.steps, ms)
        out["ablation"] = []
        for phase, marg, abl_ms in rows:
            print(f"    {marg:+.4f} ms/step  {phase}  (without: "
                  f"{abl_ms:.3f} ms/step)")
            out["ablation"].append({"phase": phase,
                                    "marginal_ms": round(marg, 4),
                                    "without_ms": round(abl_ms, 4)})

    if args.noise_off:
        cfg0 = dataclasses.replace(cfg, scan_noise_std=0.0)
        ms0, _, _ = measure_mode(cfg0, args.envs, args.steps, repeats=2)
        print(f"  noise marginal: {ms - ms0:+.4f} ms/step "
              f"(noise off: {ms0:.3f} ms/step)")
        out["noise_marginal_ms"] = round(ms - ms0, 4)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
