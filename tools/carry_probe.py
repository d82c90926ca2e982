"""Micro-probe: lax.scan carry overhead for many-small vs few-packed arrays.

The roofline trace of the default step shows ~18 async copy spans of
f32[16384,2]-class state fields per scan iteration and a 0.87 ms/step
non-lidar base running at ~1% of any hardware roofline.  Hypothesis: the
EnvState pytree's many small per-agent arrays cost per-iteration
copies/launches in the while loop, and packing them into one block would
recover real time.  This probe measures exactly that, isolated from the
simulator: a scan whose carry is (a) 16 separate (E, 2) arrays vs (b) one
(E, 32) packed array, same trivial elementwise body math, same bytes.

Usage: python tools/carry_probe.py [--envs 16384] [--steps 120]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from red_gym_tpu.utils import platform as _platform  # noqa: E402
_platform.apply()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--fields", type=int, default=16)
    args = ap.parse_args()
    e, n, steps = args.envs, args.fields, args.steps

    def timed(name, fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*xs)
            float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
            best = min(best, time.time() - t0)
        print(f"{name:42s} {best*1e3/steps:8.4f} ms/step", flush=True)
        return best

    many = tuple(jnp.full((e, 2), float(i)) for i in range(n))
    packed = jnp.concatenate([m for m in many], axis=1)        # (E, 2n)

    @jax.jit
    def scan_many(carry):
        def body(c, _):
            c = tuple(x * 0.999 + 0.001 * i for i, x in enumerate(c))
            return c, None
        c, _ = jax.lax.scan(body, carry, None, length=steps)
        return c

    @jax.jit
    def scan_packed(x):
        def body(c, _):
            scale = jnp.repeat(jnp.arange(n, dtype=x.dtype), 2)[None, :]
            return c * 0.999 + 0.001 * scale, None
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c

    timed(f"{n} separate (E,2) carries", scan_many, many)
    timed(f"1 packed (E,{2*n}) carry", scan_packed, packed)


if __name__ == "__main__":
    main()
