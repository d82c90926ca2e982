"""Scaling-efficiency sweeps (VERDICT r3 item 5).

Two sweeps, each committed as a CSV (+ optional plot) under docs/media/:

  --sweep envs     on-chip weak scaling over the batch axis: aggregate
                   env-steps/s for BENCH-style measurement at
                   envs = 2k, 4k, 8k, 16k, 32k on whatever backend is live
                   (the one real chip via the relay, or CPU when forced).
                   Each point is a killable `bench.py --measure default`
                   subprocess so a wedged relay can never hang the sweep.

  --sweep devices  virtual-device weak scaling: 1 -> 2 -> 4 -> 8 CPU
                   devices (``--xla_force_host_platform_device_count``),
                   FIXED envs per device, the full default-config env step
                   sharded over a 1-D ``env`` mesh via parallel/sharding.
                   All virtual devices share this box's one physical core,
                   so the honest claim is about *sharding overhead*, not
                   hardware speedup: env stepping is collective-free, so
                   per-device work is constant and the aggregate
                   env-steps/s should stay ~flat as devices are added
                   (efficiency = aggregate(D)/aggregate(1) ~ 1.0).  On a
                   real pod slice flat-per-core aggregate is exactly what
                   makes the scaling near-linear.

This is the honest in-environment stand-in for BASELINE.md's "near-linear
1-chip -> N-host scaling" north star (no multi-chip hardware is reachable
from this environment; reference publishes no scaling numbers at all —
its multi-env story was one process per env, reference
gym/f110_gym/envs/f110_env_backup.py:56-62).

Usage:
    python tools/scaling_sweep.py --sweep envs --out docs/media/scaling_envs.csv
    python tools/scaling_sweep.py --sweep devices --out docs/media/scaling_devices.csv
    python tools/scaling_sweep.py --plot   # render both CSVs -> png
"""

import argparse
import csv
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

MEDIA = os.path.join(_REPO, "docs", "media")


def _run_child(argv, timeout, extra_env):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env)
    try:
        return subprocess.run([sys.executable] + argv, env=env,
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None


def _parse_rate(r):
    if r is None or r.returncode != 0:
        if r is not None:
            sys.stderr.write(r.stderr[-2000:])
        return None
    for line in r.stdout.splitlines():
        if line.startswith("RATE "):
            return float(line.split()[1])
    return None


def sweep_envs(out, timeout):
    sizes = [int(s) for s in os.environ.get(
        "SWEEP_ENVS", "2048,4096,8192,16384,32768").split(",")]
    rows = []
    for n in sizes:
        t0 = time.time()
        r = _run_child([os.path.join(_REPO, "bench.py"), "--measure",
                        "default"], timeout,
                       {"BENCH_ENVS": str(n), "BENCH_STEPS": "120"})
        rate = _parse_rate(r)
        if rate is None:
            print(f"envs={n}: FAILED/timeout, skipping", flush=True)
            continue
        rows.append({"envs": n, "env_steps_s": round(rate, 1),
                     "steps_s_per_env": round(rate / n, 1)})
        print(f"envs={n}: {rate:,.0f} env-steps/s "
              f"({time.time()-t0:.0f}s incl. compile)", flush=True)
    _write(out, rows, ["envs", "env_steps_s", "steps_s_per_env"])


def sweep_devices(out, timeout, per_device, steps):
    rows, base = [], None
    for d in (1, 2, 4, 8):
        # RGT_PLATFORM (not JAX_PLATFORMS): this image pre-imports jax with
        # the TPU plugin via sitecustomize, see red_gym_tpu/utils/platform.py
        r = _run_child(
            [os.path.abspath(__file__), "--child-devices", str(d),
             str(per_device), str(steps)], timeout,
            {"RGT_PLATFORM": "cpu",
             "XLA_FLAGS": f"--xla_force_host_platform_device_count={d}"})
        rate = _parse_rate(r)
        if rate is None:
            print(f"devices={d}: FAILED/timeout, skipping", flush=True)
            continue
        if base is None:
            base = rate
        rows.append({"devices": d, "envs": d * per_device,
                     "env_steps_s": round(rate, 1),
                     "efficiency_vs_1dev": round(rate / base, 3)})
        print(f"devices={d} ({d * per_device} envs): {rate:,.0f} "
              f"env-steps/s, eff {rate / base:.3f}", flush=True)
    _write(out, rows, ["devices", "envs", "env_steps_s",
                       "efficiency_vs_1dev"])


def _child_devices(d, per_device, steps):
    """One timed point: default-config env step sharded over d devices."""
    from red_gym_tpu.utils import platform as _platform
    _platform.apply()

    import jax
    import jax.numpy as jnp

    from red_gym_tpu import env as envlib, rollout
    from red_gym_tpu.assets import example_map_yaml
    from red_gym_tpu.parallel import sharding
    import bench

    assert len(jax.devices()) == d, (jax.devices(), d)
    cfg = bench.make_cfg("default")
    params = envlib.make_params(cfg, example_map_yaml(), ".png")
    n = d * per_device
    start = envlib.staggered_start_poses(cfg.num_agents)
    poses = jnp.tile(jnp.asarray(start, jnp.float32), (n, 1, 1))

    mesh = sharding.make_env_mesh(d)
    params = sharding.shard_params(mesh, params)
    states, obs, *_ = rollout.batched_reset(
        cfg, params, poses, jax.random.split(jax.random.PRNGKey(0), n))
    states = sharding.shard_envs(mesh, states)
    obs = sharding.shard_envs(mesh, obs)

    run = rollout.make_rollout(cfg, params, rollout.random_policy(cfg),
                               steps=steps)
    carry = rollout.RolloutCarry(states, obs, jax.random.PRNGKey(1))
    carry, (rew, done) = run(carry)             # compile + warmup
    jax.block_until_ready(carry.state)
    rate = 0.0
    for _ in range(3):
        t0 = time.time()
        carry, (rew, done) = run(carry)
        jax.block_until_ready(carry.state)
        rate = max(rate, n * steps / (time.time() - t0))
    print(f"RATE {rate:.1f}", flush=True)


def _write(out, rows, fields):
    if not rows:
        print("no successful points; not writing", file=sys.stderr)
        sys.exit(1)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}", flush=True)


def plot():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    fe = os.path.join(MEDIA, "scaling_envs.csv")
    fd = os.path.join(MEDIA, "scaling_devices.csv")
    if os.path.exists(fe):
        with open(fe) as f:
            rows = list(csv.DictReader(f))
        x = [int(r["envs"]) for r in rows]
        y = [float(r["env_steps_s"]) / 1e6 for r in rows]
        axes[0].plot(x, y, "o-")
        axes[0].set_xscale("log", base=2)
        axes[0].set_xlabel("batch size (envs)")
        axes[0].set_ylabel("aggregate M env-steps/s")
        axes[0].set_title("on-chip weak scaling (1 chip, default mode)")
        axes[0].grid(alpha=0.3)
    if os.path.exists(fd):
        with open(fd) as f:
            rows = list(csv.DictReader(f))
        x = [int(r["devices"]) for r in rows]
        y = [float(r["efficiency_vs_1dev"]) for r in rows]
        axes[1].plot(x, y, "s-")
        axes[1].axhline(1.0, ls="--", c="gray", lw=1)
        axes[1].set_ylim(0, 1.3)
        axes[1].set_xlabel("virtual devices (1 shared physical core)")
        axes[1].set_ylabel("aggregate throughput vs 1 device")
        axes[1].set_title("sharding overhead: fixed envs/device")
        axes[1].grid(alpha=0.3)
    fig.tight_layout()
    out = os.path.join(MEDIA, "scaling.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", choices=("envs", "devices"))
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-point subprocess timeout (s)")
    ap.add_argument("--per-device", type=int, default=64)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--child-devices", nargs=3, type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_devices:
        _child_devices(*args.child_devices)
        return
    if args.sweep == "envs":
        sweep_envs(args.out or os.path.join(MEDIA, "scaling_envs.csv"),
                   args.timeout)
    elif args.sweep == "devices":
        sweep_devices(args.out or os.path.join(MEDIA, "scaling_devices.csv"),
                      args.timeout, args.per_device, args.steps)
    if args.plot:
        plot()


if __name__ == "__main__":
    main()
