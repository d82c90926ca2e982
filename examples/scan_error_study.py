"""Fast-scan error study: measure the fast-mode error distribution vs the
exact float64 march at the SHIPPED texture settings, across the occlusion /
gradient-channel modes introduced in round 3.

Prints one line per (occlusion, grad, spatial, interp) combination with
median / p90 / p99 / max error and the occlusion-tail fractions (beams off
by > 1 and > 4 texture cells) — the numbers docs/performance.md and the
error-contract test (tests/test_scan_fast.py) pin.

Reference for what this approximates: the exact per-beam sphere march of
/root/reference/gym/f110_gym/envs/laser_models.py:107-146.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

# float64 oracle => CPU backend (the env var is pre-empted by the site's
# jax plugin import; the config update works regardless)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.maps.loader import load_map
from red_gym_tpu.ops import scan as scan_ops, scan_fast

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "red_gym_tpu", "assets", "data")


def sample_poses(tmap64, n, rng, min_clearance=0.3):
    dt_np = np.asarray(tmap64.dt)
    res = float(tmap64.resolution)
    poses = []
    while len(poses) < n:
        r = rng.integers(0, dt_np.shape[0])
        c = rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > min_clearance:
            poses.append([c * res + float(tmap64.orig_x) + res / 2,
                          r * res + float(tmap64.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    return np.asarray(poses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="track_wide")
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    y = os.path.join(DATA, f"{args.map}.yaml")
    base = SimConfig(num_agents=1, num_beams=1080, dtype="float32",
                     scan_mode="fast")
    cfg64 = dataclasses.replace(base, dtype="float64", rt_occlusion="off",
                                rt_grad=False)
    tmap32 = load_map(y, ".png", dtype=jnp.float32)
    tmap64 = load_map(y, ".png", dtype=jnp.float64)
    tab32 = scan_ops.build_tables(base, 0.31, 0.58, dtype=jnp.float32)
    tab64 = scan_ops.build_tables(cfg64, 0.31, 0.58, dtype=jnp.float64)

    rng = np.random.default_rng(args.seed)
    poses = sample_poses(tmap64, args.poses, rng)
    exact = np.asarray(scan_ops.trace(jnp.asarray(poses), tab64, tmap64,
                                      cfg64))

    combos = [("edge", True), ("edge", False), ("snap", False),
              ("off", True), ("off", False)]
    textures = {}
    for occ, grad in combos:
        key = (occ == "edge", grad)
        if key not in textures:
            c = dataclasses.replace(base, rt_occlusion=occ, rt_grad=grad)
            textures[key] = scan_fast.build_range_texture(tmap32, c)
    cell = float(textures[(False, False)].cell)

    results = []
    for occ, grad in combos:
        for spatial in ("nearest1", "bilinear"):
            for interp in (("linear",) if occ != "off"
                           else ("linear", "spectral")):
                c = dataclasses.replace(base, rt_occlusion=occ, rt_grad=grad,
                                        rt_spatial=spatial, scan_interp=interp)
                rtex = textures[(c.rt_eff_occlusion == "edge", grad)]
                fast = np.asarray(scan_fast.trace_fast_mxu(
                    jnp.asarray(poses, np.float32), tab32, tmap32, rtex, c))
                err = np.abs(exact - fast)
                row = {
                    "occ": occ, "grad": grad, "spatial": spatial,
                    "interp": interp,
                    "median": round(float(np.median(err)), 4),
                    "p90": round(float(np.quantile(err, 0.9)), 4),
                    "p99": round(float(np.quantile(err, 0.99)), 4),
                    "max": round(float(err.max()), 3),
                    "frac_gt_1cell": round(float(np.mean(err > cell)), 5),
                    "frac_gt_4cell": round(float(np.mean(err > 4 * cell)), 5),
                }
                results.append(row)
                print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
