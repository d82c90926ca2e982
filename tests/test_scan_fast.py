"""Fast-mode (range texture) lidar accuracy and behavioral tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu.maps.loader import load_map
from red_gym_tpu.ops import scan as scan_ops, scan_fast
from red_gym_tpu import env as envlib
from red_gym_tpu.agents import pure_pursuit as pp

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map.yaml"
# coarse texture settings keep the CPU-test precompute cheap
CFG = SimConfig(num_agents=1, num_beams=270, dtype="float64",
                scan_mode="fast", rt_theta_bins=128, rt_pose_stride=4)


@pytest.fixture(scope="module")
def setup():
    tmap = load_map(MAP_YAML, ".png", dtype=jnp.float64)
    tables = scan_ops.build_tables(CFG, 0.31, 0.58, dtype=jnp.float64)
    rtex = scan_fast.build_range_texture(tmap, CFG)
    return tmap, tables, rtex


def test_fast_vs_exact_error(setup):
    """Median beam error small; bulk of beams within the texture cell size."""
    tmap, tables, rtex = setup
    rng = np.random.default_rng(0)
    # random free poses well inside the track
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < 16:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 1.0:
            poses.append([c * res + float(tmap.orig_x) + res / 2,
                          r * res + float(tmap.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    poses = jnp.asarray(poses)

    exact = np.asarray(scan_ops.trace(poses, tables, tmap, CFG))
    fast = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, CFG))
    err = np.abs(exact - fast)
    cell = float(rtex.cell)
    assert np.median(err) < 0.5 * cell, f"median err {np.median(err):.3f}m"
    assert np.quantile(err, 0.9) < 4 * cell, f"p90 err {np.quantile(err, 0.9):.3f}m"
    assert np.all(fast >= 0) and np.all(fast <= CFG.max_range)


@pytest.mark.slow
def test_fast_mode_env_laps_track(setup):
    """The pure-pursuit car still completes laps with fast-mode lidar (the
    trajectory itself is scan-independent; this exercises the full env)."""
    params = envlib.make_params(CFG, MAP_YAML, ".png")
    assert params.rtex is not None
    wpts = pp.load_waypoints_csv("/root/reference/examples/example_waypoints.csv",
                                 dtype=jnp.float64)
    ppp = pp.make_params(wpts)

    def body(carry, _):
        state, obs = carry
        speed, steer = pp.plan(obs.poses_x[0], obs.poses_y[0],
                               obs.poses_theta[0], ppp)
        state, obs, _, done, _ = envlib.step(
            CFG, params, state, jnp.stack([steer, speed])[None, :])
        return (state, obs), (done, obs.collisions[0])

    state, obs, *_ = envlib.reset(
        CFG, params, jnp.asarray([[0.7, 0.0, 1.37079632679]]),
        jax.random.PRNGKey(0))

    @jax.jit
    def rollout(s, o):
        return jax.lax.scan(body, (s, o), None, length=4000)

    (state, obs), (dones, colls) = rollout(state, obs)
    assert not np.any(np.asarray(colls) > 0), "fast-mode lidar caused a phantom collision"
    assert np.asarray(dones).any(), "lap did not complete in fast mode"


def test_mxu_variant_matches_gather_variant(setup):
    """trace_fast_mxu (matmul interpolation) == trace_fast (element gather)."""
    tmap, tables, rtex = setup
    rng = np.random.default_rng(3)
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < 8:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 0.5:
            poses.append([c * res + float(tmap.orig_x), r * res + float(tmap.orig_y),
                          rng.uniform(0, 2 * np.pi)])
    poses = jnp.asarray(poses)
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, CFG))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, CFG))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)


def test_spectral_interp_accuracy(setup):
    """scan_interp='spectral' (windowed trig interpolation, no elementwise
    tail) stays close to the exact march: same error class as the linear
    fast mode away from occlusion edges."""
    import dataclasses

    tmap, tables, rtex = setup
    cfg_s = dataclasses.replace(CFG, scan_interp="spectral")
    rng = np.random.default_rng(11)
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < 16:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 1.0:
            poses.append([c * res + float(tmap.orig_x) + res / 2,
                          r * res + float(tmap.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    poses = jnp.asarray(poses)

    exact = np.asarray(scan_ops.trace(poses, tables, tmap, CFG))
    spec = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_s))
    err = np.abs(exact - spec)
    cell = float(rtex.cell)
    assert np.median(err) < 0.75 * cell, f"median err {np.median(err):.3f}m"
    assert np.quantile(err, 0.9) < 5 * cell, f"p90 err {np.quantile(err, 0.9):.3f}m"
    assert np.all(spec >= 0) and np.all(spec <= CFG.max_range)


@pytest.mark.slow
def test_pallas_epilogue_matches_xla(setup):
    """The fused Pallas shuffle-matmul + blend kernel (interpret mode off
    TPU) equals the unfused XLA path, including under vmap (the custom_vmap
    rule collapses batch axes into kernel rows)."""
    import dataclasses

    tmap, tables, rtex = setup
    cfg_x = dataclasses.replace(CFG, scan_backend="xla")
    cfg_p = dataclasses.replace(CFG, scan_backend="pallas")
    rng = np.random.default_rng(7)
    poses = jnp.asarray(np.stack([rng.uniform(-5, 5, 6), rng.uniform(-5, 5, 6),
                                  rng.uniform(0, 2 * np.pi, 6)], axis=-1))
    a = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_x))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_p))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)

    # vmapped (the env.step composition): (E, A, 3) poses
    pv = poses.reshape(3, 2, 3)
    f_x = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_x)))
    f_p = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_p)))
    np.testing.assert_allclose(np.asarray(f_x(pv)), np.asarray(f_p(pv)),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_mxu_variant_fov47(setup):
    """The constant-matmul path handles a non-2pi FOV (upstream default
    4.7 rad): beam offsets c_b span only part of the circle, kb stays
    negative at the left edge."""
    import dataclasses

    tmap, _, _ = setup
    cfg = dataclasses.replace(CFG, fov=4.7, num_beams=108)
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    rtex = scan_fast.build_range_texture(tmap, cfg)
    rng = np.random.default_rng(21)
    poses = jnp.asarray(np.stack([rng.uniform(-5, 5, 6), rng.uniform(-5, 5, 6),
                                  rng.uniform(0, 2 * np.pi, 6)], axis=-1))
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, cfg))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)


def test_texture_shapes(setup):
    tmap, tables, rtex = setup
    hc, wc = int(rtex.hc), int(rtex.wc)
    assert rtex.rt.shape == (hc * wc, CFG.rt_theta_bins)
    assert rtex.valid.shape == (hc * wc,)
    # occupied rows are zeroed
    occ_rows = np.asarray(rtex.rt)[~np.asarray(rtex.valid)]
    assert occ_rows.size == 0 or np.all(occ_rows == 0)


@pytest.mark.slow
def test_error_contract_shipped_defaults_f32():
    """Error contract at the SHIPPED configuration: rt_pose_stride=2 (cell =
    0.125 m at the 0.0625 m/px maps), 128 theta bins, float32 textures (the
    TPU dtype), 1080 beams — gates for both theta interpolation modes,
    including occlusion-edge tail statistics (docs/performance.md pins the
    measured values; these bounds carry ~1.5-2x headroom)."""
    import dataclasses

    data = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                        "assets", "data")
    y = os.path.join(data, "track_wide.yaml")
    cfg32 = SimConfig(num_agents=1, num_beams=1080, dtype="float32",
                      scan_mode="fast")
    assert cfg32.rt_pose_stride == 2 and cfg32.rt_theta_bins == 128, \
        "shipped defaults changed; re-pin this contract"
    cfg64 = dataclasses.replace(cfg32, dtype="float64")
    tmap32 = load_map(y, ".png", dtype=jnp.float32)
    tmap64 = load_map(y, ".png", dtype=jnp.float64)
    tab32 = scan_ops.build_tables(cfg32, 0.31, 0.58, dtype=jnp.float32)
    tab64 = scan_ops.build_tables(cfg64, 0.31, 0.58, dtype=jnp.float64)
    rtex32 = scan_fast.build_range_texture(tmap32, cfg32)

    rng = np.random.default_rng(0)
    dt_np = np.asarray(tmap64.dt)
    res = float(tmap64.resolution)
    poses = []
    while len(poses) < 64:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 0.3:     # free space including near-wall poses
            poses.append([c * res + float(tmap64.orig_x) + res / 2,
                          r * res + float(tmap64.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    poses = np.asarray(poses)
    exact = np.asarray(scan_ops.trace(jnp.asarray(poses), tab64, tmap64,
                                      cfg64))
    cell = float(rtex32.cell)
    # measured at pin time (linear/spectral): median .025/.027, p90 .069/.095,
    # frac>cell .040/.077, frac>4cell .025/.041
    gates = {"linear": (0.05, 0.15, 0.08, 0.05),
             "spectral": (0.06, 0.20, 0.12, 0.07)}
    for interp, (g_med, g_p90, g_cell, g_4cell) in gates.items():
        ci = dataclasses.replace(cfg32, scan_interp=interp)
        fast = np.asarray(scan_fast.trace_fast_mxu(
            jnp.asarray(poses, np.float32), tab32, tmap32, rtex32, ci))
        err = np.abs(exact - fast)
        assert np.median(err) < g_med, (interp, np.median(err))
        assert np.quantile(err, 0.9) < g_p90, (interp, np.quantile(err, 0.9))
        # occlusion-edge tail: bounded fraction of beams off by >1 / >4 cells
        assert np.mean(err > cell) < g_cell, (interp, np.mean(err > cell))
        assert np.mean(err > 4 * cell) < g_4cell, (interp,
                                                   np.mean(err > 4 * cell))
        assert np.all(fast >= 0) and np.all(fast <= cfg32.max_range)


def test_texture_disk_cache_roundtrip(tmp_path, setup, monkeypatch):
    """The marched texture memoizes to disk by content hash: a rebuild with
    the same map+config loads bit-identical arrays; changing the config
    misses; disabling via env var builds fresh."""
    tmap, tables, rtex = setup
    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", str(tmp_path))
    r1 = scan_fast.build_range_texture(tmap, CFG)
    files = list(tmp_path.glob("rtex_*.npz"))
    assert len(files) == 1
    r2 = scan_fast.build_range_texture(tmap, CFG)   # cache hit
    np.testing.assert_array_equal(np.asarray(r1.rt), np.asarray(r2.rt))
    np.testing.assert_array_equal(np.asarray(r1.valid), np.asarray(r2.valid))
    # matches the uncached fixture build too
    np.testing.assert_array_equal(np.asarray(r1.rt), np.asarray(rtex.rt))

    import dataclasses
    cfg2 = dataclasses.replace(CFG, rt_theta_bins=16)
    scan_fast.build_range_texture(tmap, cfg2)
    assert len(list(tmp_path.glob("rtex_*.npz"))) == 2, "config change must miss"

    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", "off")
    r3 = scan_fast.build_range_texture(tmap, CFG)
    np.testing.assert_array_equal(np.asarray(r1.rt), np.asarray(r3.rt))
    assert len(list(tmp_path.glob("rtex_*.npz"))) == 2


def test_nearest_spatial_mode(setup):
    """rt_spatial='nearest' (single best cell, one-hot blend): the MXU and
    gather variants agree, and ranges stay within the coarse-texture error
    class of the exact march."""
    import dataclasses

    tmap, tables, rtex = setup
    cfg_n = dataclasses.replace(CFG, rt_spatial="nearest")
    rng = np.random.default_rng(5)
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < 12:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 1.0:
            poses.append([c * res + float(tmap.orig_x) + res / 2,
                          r * res + float(tmap.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    poses = jnp.asarray(poses)
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, cfg_n))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_n))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)
    exact = np.asarray(scan_ops.trace(poses, tables, tmap, CFG))
    err = np.abs(exact - b)
    cell = float(rtex.cell)
    assert np.median(err) < 1.0 * cell
    assert np.all(b >= 0) and np.all(b <= CFG.max_range)


def test_nearest1_single_gather_mode(setup):
    """rt_spatial='nearest1' (one rounded-cell gather): MXU and gather
    variants agree; error stays in the nearest-cell class; poses whose
    nearest cell center is occupied read scan 0 (they are inside the car's
    own half-width of a wall, i.e. already colliding)."""
    import dataclasses

    tmap, tables, rtex = setup
    cfg_n = dataclasses.replace(CFG, rt_spatial="nearest1")
    rng = np.random.default_rng(6)
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < 12:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 1.0:
            poses.append([c * res + float(tmap.orig_x) + res / 2,
                          r * res + float(tmap.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    poses = jnp.asarray(poses)
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, cfg_n))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_n))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)
    exact = np.asarray(scan_ops.trace(poses, tables, tmap, CFG))
    err = np.abs(exact - b)
    assert np.median(err) < 1.0 * float(rtex.cell)

    # a pose whose nearest cell center is inside a wall reads all-zero
    occ = np.argwhere(dt_np == 0.0)
    r, c = occ[len(occ) // 2]
    wall_pose = jnp.asarray([[c * res + float(tmap.orig_x) + res / 2,
                              r * res + float(tmap.orig_y) + res / 2, 0.0]])
    z = np.asarray(scan_fast.trace_fast_mxu(wall_pose, tables, tmap, rtex,
                                            cfg_n))
    assert np.all(z == 0.0)
