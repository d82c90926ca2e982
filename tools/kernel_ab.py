"""Isolated on-chip A/B of the fused edge+iTTC kernel variants.

Times pallas_scan.theta_shuffle_blend_edge_ttc alone at bench-scale row
counts (32768 rows = 16384 envs x 2 agents) to attribute the kernel's share
of the step and try targeted variants (e.g. matmul precision) without
re-jitting the whole env.  Each timed call loops the kernel N times via
lax.scan with a data dependency so the relay round trip amortizes.

Usage: python tools/kernel_ab.py [--rows 32768] [--iters 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from red_gym_tpu.utils import platform as _platform  # noqa: E402
_platform.apply()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from red_gym_tpu.ops import pallas_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--agents", type=int, default=2)
    args = ap.parse_args()

    K, T, B, A = args.rows, 128, 1080, args.agents
    rng = np.random.default_rng(0)
    spec_r = jnp.asarray(rng.normal(size=(K, T)), jnp.float32)
    spec_e = jnp.asarray(rng.normal(size=(K, T)), jnp.float32)
    spec_w = jnp.asarray(rng.normal(size=(K, T)), jnp.float32)
    f_s = jnp.asarray(rng.uniform(size=(K,)), jnp.float32)
    wsum = jnp.ones((K,), jnp.float32)
    vel = jnp.asarray(rng.uniform(size=(K,), low=-3, high=6), jnp.float32)
    gmat = jnp.asarray(rng.normal(size=(T, 3 * B)), jnp.float32)
    c_frac = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)
    noise = jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32)
    cosines = jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32)
    side = jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32)
    smat = jnp.asarray(rng.normal(size=(T, B)), jnp.float32)

    def timed(name, fn, *xs):
        @jax.jit
        def loop(*xs):
            def body(c, _):
                out = fn(*xs)
                leaves = [v for v in jax.tree.leaves(out)]
                return c + sum(jnp.sum(l[..., :1]) for l in leaves), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                  length=args.iters)
            return acc
        float(loop(*xs))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(loop(*xs))
            best = min(best, (time.time() - t0) / args.iters)
        print(f"{name:32s} {best*1e3:8.3f} ms/call "
              f"({K/best/1e6:7.1f}M rows/s)", flush=True)
        return best

    timed("edge_ttc (shipped, ew=bf16)",
          lambda *xs: pallas_scan.theta_shuffle_blend_edge_ttc(
              *xs, 30.0, 0.005, A, ew_dtype=jnp.bfloat16),
          spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac, noise,
          cosines, side)
    timed("edge_ttc (ew=f32)",
          lambda *xs: pallas_scan.theta_shuffle_blend_edge_ttc(
              *xs, 30.0, 0.005, A, ew_dtype=jnp.float32),
          spec_r, spec_e, spec_w, f_s, wsum, vel, gmat, c_frac, noise,
          cosines, side)
    timed("edge (no ttc tail)",
          lambda *xs: pallas_scan.theta_shuffle_blend_edge(
              *xs, 30.0, ew_dtype=jnp.bfloat16),
          spec_r, spec_e, spec_w, f_s, wsum, gmat, c_frac)
    timed("plain 3-tap blend",
          lambda *xs: pallas_scan.theta_shuffle_blend(*xs, 30.0),
          spec_r, f_s, wsum, gmat, c_frac)


if __name__ == "__main__":
    main()
