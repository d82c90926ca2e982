"""Lidar scan simulator parity and property tests.

The reference's golden cross-implementation test compared its scans to the
retired C++ backend via MSE (reference: gym/f110_gym/unittest/scan_sim.py:
322-366).  Our equivalent oracle is the reference Python simulator itself:
in float64 the vectorized sphere march must reproduce it bit-exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu.maps.loader import load_map
from red_gym_tpu.ops import scan as scan_ops

from tests._assets import requires_reference

pytestmark = requires_reference

EXAMPLE_MAP = "/root/reference/examples/example_map.yaml"
BERLIN_MAP = "/root/reference/gym/f110_gym/envs/maps/berlin.yaml"


@pytest.fixture(scope="module", params=["example", "berlin"])
def map_pair(request, reference):
    path = EXAMPLE_MAP if request.param == "example" else BERLIN_MAP
    ref_sim = reference.laser_models.ScanSimulator2D(1080, 2 * np.pi)
    ref_sim.set_map(path, ".png")
    tmap = load_map(path, ".png", dtype=jnp.float64)
    return ref_sim, tmap, path


def _poses_on_map(ref_sim, n, seed=0):
    """Random poses in free space (dt > 0.5m) so rays march meaningfully."""
    rng = np.random.default_rng(seed)
    h, w = ref_sim.map_height, ref_sim.map_width
    res = ref_sim.map_resolution
    poses = []
    while len(poses) < n:
        r = rng.integers(0, h)
        c = rng.integers(0, w)
        if ref_sim.dt[r, c] > 0.5:
            x = c * res + ref_sim.orig_x + res / 2
            y = r * res + ref_sim.orig_y + res / 2
            poses.append([x, y, rng.uniform(0, 2 * np.pi)])
    return np.array(poses)


def test_map_loader_matches_reference(map_pair):
    ref_sim, tmap, _ = map_pair
    np.testing.assert_array_equal(np.asarray(tmap.dt), ref_sim.dt)
    assert float(tmap.orig_x) == ref_sim.orig_x
    assert float(tmap.orig_y) == ref_sim.orig_y
    assert float(tmap.resolution) == ref_sim.map_resolution
    assert int(tmap.height) == ref_sim.map_height
    assert int(tmap.width) == ref_sim.map_width


def test_scan_bit_parity(map_pair):
    """Noiseless scans match the reference sphere march bit-for-bit (f64)."""
    ref_sim, tmap, _ = map_pair
    cfg = SimConfig(num_beams=1080, dtype="float64")
    tables = scan_ops.build_tables(cfg, width=0.31, length=0.58, dtype=jnp.float64)

    poses = _poses_on_map(ref_sim, 12)
    got = np.asarray(scan_ops.trace(jnp.asarray(poses), tables, tmap, cfg))
    for i, pose in enumerate(poses):
        want = ref_sim.scan(pose, None)
        np.testing.assert_array_equal(got[i], want, err_msg=f"pose {pose}")


def test_scan_fov47_parity(map_pair):
    """Also exact under the upstream 4.7 rad fov (non-2pi path)."""
    ref_sim_any, tmap, path = map_pair
    import tests._reference as _r
    ref_sim = _r.load().laser_models.ScanSimulator2D(1080, 4.7)
    ref_sim.set_map(path, ".png")
    cfg = SimConfig(num_beams=1080, fov=4.7, dtype="float64")
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    poses = _poses_on_map(ref_sim, 6, seed=3)
    got = np.asarray(scan_ops.trace(jnp.asarray(poses), tables, tmap, cfg))
    for i, pose in enumerate(poses):
        np.testing.assert_array_equal(got[i], ref_sim.scan(pose, None))


def test_out_of_bounds_pose(map_pair):
    """A pose far outside the map reads the dt[-1,-1] sentinel like the
    reference (laser_models.py:79-86) and terminates without hanging."""
    ref_sim, tmap, _ = map_pair
    cfg = SimConfig(num_beams=64, dtype="float64")
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    pose = jnp.asarray([1e6, 1e6, 0.3], dtype=jnp.float64)
    got = np.asarray(scan_ops.trace(pose, tables, tmap, cfg))
    assert got.shape == (64,)
    assert np.all(np.isfinite(got))


def test_fixed_iteration_budget_matches(map_pair):
    """march_iters>0 (static fori_loop) equals the while_loop result when the
    budget covers the worst-case trip count."""
    ref_sim, tmap, _ = map_pair
    poses = jnp.asarray(_poses_on_map(ref_sim, 4, seed=1))
    cfg_w = SimConfig(num_beams=256, dtype="float64")
    cfg_f = SimConfig(num_beams=256, dtype="float64", march_iters=256)
    tables = scan_ops.build_tables(cfg_w, 0.31, 0.58, dtype=jnp.float64)
    a = scan_ops.trace(poses, tables, tmap, cfg_w)
    b = scan_ops.trace(poses, tables, tmap, cfg_f)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noise_determinism(map_pair):
    """Same key -> identical noisy scan; consumed key -> different
    (reference test_rng, laser_models.py:554-580, re-keyed to JAX PRNG)."""
    ref_sim, tmap, _ = map_pair
    cfg = SimConfig(num_beams=128, dtype="float64")
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    pose = jnp.asarray(_poses_on_map(ref_sim, 1, seed=2)[0])
    k1 = jax.random.PRNGKey(12345)
    s1 = scan_ops.scan(pose, k1, tables, tmap, cfg)
    s2 = scan_ops.scan(pose, k1, tables, tmap, cfg)
    s3 = scan_ops.scan(pose, jax.random.split(k1)[0], tables, tmap, cfg)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_padded_map_equals_unpadded(map_pair):
    ref_sim, tmap, path = map_pair
    h, w = ref_sim.map_height, ref_sim.map_width
    padded = load_map(path, ".png", dtype=jnp.float64, pad_to=(h + 37, w + 11))
    cfg = SimConfig(num_beams=256, dtype="float64")
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    poses = jnp.asarray(_poses_on_map(ref_sim, 4, seed=5))
    a = scan_ops.trace(poses, tables, tmap, cfg)
    b = scan_ops.trace(poses, tables, padded, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


