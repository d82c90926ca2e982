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
# coarse texture settings keep the CPU-test precompute cheap; plain-lerp /
# no-gradient mode — the round-3 occlusion/gradient channels have their own
# configs + fixtures below
CFG = SimConfig(num_agents=1, num_beams=270, dtype="float64",
                scan_mode="fast", rt_theta_bins=128, rt_pose_stride=4,
                rt_occlusion="off", rt_grad=False)
# edge/grad-channel config: even coarser stride (the edge build marches
# ~13x per bin pair; stride 8 keeps the 1600^2 example-map fixture cheap)
CFG_EDGE = SimConfig(num_agents=1, num_beams=270, dtype="float64",
                     scan_mode="fast", rt_theta_bins=128, rt_pose_stride=8,
                     rt_occlusion="edge", rt_grad=True)
# plain-lerp config on the SAME stride-8 grid (fair tail comparison)
CFG_OFF8 = SimConfig(num_agents=1, num_beams=270, dtype="float64",
                     scan_mode="fast", rt_theta_bins=128, rt_pose_stride=8,
                     rt_occlusion="off", rt_grad=False)


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


def _contract_poses(tmap64, n=64, seed=0):
    rng = np.random.default_rng(seed)
    dt_np = np.asarray(tmap64.dt)
    res = float(tmap64.resolution)
    poses = []
    while len(poses) < n:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > 0.3:     # free space including near-wall poses
            poses.append([c * res + float(tmap64.orig_x) + res / 2,
                          r * res + float(tmap64.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    return np.asarray(poses)


def _run_contract(stride, gates):
    """Shared error-contract harness: f32 textures at the given stride on
    track_wide vs the f64 exact march; gates keyed by a config mutation."""
    import dataclasses

    data = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                        "assets", "data")
    y = os.path.join(data, "track_wide.yaml")
    cfg32 = SimConfig(num_agents=1, num_beams=1080, dtype="float32",
                      scan_mode="fast", rt_pose_stride=stride)
    cfg64 = dataclasses.replace(cfg32, dtype="float64", rt_occlusion="off",
                                rt_grad=False)
    tmap32 = load_map(y, ".png", dtype=jnp.float32)
    tmap64 = load_map(y, ".png", dtype=jnp.float64)
    tab32 = scan_ops.build_tables(cfg32, 0.31, 0.58, dtype=jnp.float32)
    tab64 = scan_ops.build_tables(cfg64, 0.31, 0.58, dtype=jnp.float64)

    poses = _contract_poses(tmap64)
    exact = np.asarray(scan_ops.trace(jnp.asarray(poses), tab64, tmap64,
                                      cfg64))
    textures = {}
    for name, (mut, _) in gates.items():
        ci = dataclasses.replace(cfg32, **mut)
        key = (ci.rt_eff_occlusion, ci.rt_grad)
        if key not in textures:
            textures[key] = scan_fast.build_range_texture(tmap32, ci)
        rtex = textures[key]
        cell = float(rtex.cell)
        fast = np.asarray(scan_fast.trace_fast_mxu(
            jnp.asarray(poses, np.float32), tab32, tmap32, rtex, ci))
        err = np.abs(exact - fast)
        g_med, g_p90, g_p99, g_cell, g_4cell = gates[name][1]
        assert np.median(err) < g_med, (name, np.median(err))
        assert np.quantile(err, 0.9) < g_p90, (name, np.quantile(err, 0.9))
        assert np.quantile(err, 0.99) < g_p99, (name, np.quantile(err, 0.99))
        assert np.mean(err > cell) < g_cell, (name, np.mean(err > cell))
        assert np.mean(err > 4 * cell) < g_4cell, (name,
                                                   np.mean(err > 4 * cell))
        assert np.all(fast >= 0) and np.all(fast <= cfg32.max_range)


@pytest.mark.slow
def test_error_contract_shipped_defaults_f32():
    """Error contract at the SHIPPED configuration: rt_pose_stride=2 (cell =
    0.125 m at the 0.0625 m/px maps), 128 theta bins, float32 textures (the
    TPU dtype), 1080 beams, nearest1/linear with edge+gradient channels
    (the round-3 default).  Gates pin the r3 study values with ~1.5x
    headroom; docs/performance.md carries the measured numbers.

    Measured at pin time (track_wide, 64 poses incl. near-wall):
      default (nearest1/linear/edge+grad): median .031, p90 .102, p99 .375,
        >1cell 6.6%, >4cell 0.79%  (pre-r3 defaults: p99 3.52, >4cell 2.5%)
      spectral ultra mode (grad, no edge):  median .034, p90 .140, p99 4.54,
        >1cell 11.7%, >4cell 3.8%
      legacy bilinear/linear (no channels): median .026, p90 .071, p99 3.52,
        >1cell 4.1%, >4cell 2.5%
    """
    cfg_probe = SimConfig(scan_mode="fast")
    assert (cfg_probe.rt_pose_stride, cfg_probe.rt_theta_bins,
            cfg_probe.rt_spatial, cfg_probe.scan_interp,
            cfg_probe.rt_occlusion, cfg_probe.rt_grad) == \
        (2, 128, "nearest1", "linear", "edge", True), \
        "shipped defaults changed; re-pin this contract"
    _run_contract(stride=2, gates={
        "default": ({}, (0.05, 0.16, 0.55, 0.10, 0.015)),
        "spectral": ({"scan_interp": "spectral"},
                     (0.06, 0.22, 6.0, 0.17, 0.06)),
        "legacy": ({"rt_occlusion": "off", "rt_grad": False,
                    "rt_spatial": "bilinear"},
                   (0.05, 0.12, 5.0, 0.08, 0.04)),
    })


def test_error_contract_sentinel_coarse():
    """Fast-lane sentinel of the same contract at rt_pose_stride=8 (cheap
    fresh build): catches regressions in the edge/grad machinery without
    the stride-2 build cost on cold-cache machines.  Gates scaled to the
    0.5 m cell."""
    _run_contract(stride=8, gates={
        "default": ({}, (0.35, 1.0, 3.2, 0.32, 0.05)),
        # the TPU XLA-fallback numerics: (e, w) shuffle matmul +
        # intermediate in bfloat16 (rt_ew_dtype docstring) — a bf16 ulp
        # moves the ramp by <0.2% of a bin, so the gates are identical
        "ew_bf16": ({"rt_ew_dtype": "bfloat16"},
                    (0.35, 1.0, 3.2, 0.32, 0.05)),
    })


def _tiny_tmap(seed=0, n=48):
    """Small synthetic TrackMap (box walls + random blobs) — the caching
    logic is map-agnostic, so cache tests need not march the 1600^2
    example map (was 115 s of the fast lane)."""
    from scipy.ndimage import distance_transform_edt

    from red_gym_tpu.maps.loader import TrackMap

    rng = np.random.default_rng(seed)
    occ = np.full((n, n), 255.0)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 0.0
    for _ in range(4):
        r, c = rng.integers(4, n - 4, 2)
        occ[r - 1:r + 2, c - 1:c + 2] = 0.0
    res = 0.25
    dt = distance_transform_edt(occ) * res
    z = lambda v: jnp.asarray(v, jnp.float64)
    return TrackMap(dt=z(dt), occupancy=z(occ), orig_x=z(0.0), orig_y=z(0.0),
                    orig_c=z(1.0), orig_s=z(0.0), resolution=z(res),
                    height=jnp.asarray(n, jnp.int32),
                    width=jnp.asarray(n, jnp.int32))


def test_compact_build_matches_dense(monkeypatch):
    """The default (compact) cold build gathers only the jump>thr bins of
    free cells for edge localization; the dense path marches every bin and
    selects.  Same elementwise math on the same bins => the texture must be
    BIT-identical (this is what makes the ~10x cold-build speedup free)."""
    import dataclasses

    tmap = _tiny_tmap(seed=11, n=40)
    cfg = dataclasses.replace(CFG, rt_occlusion="edge", rt_grad=True,
                              rt_pose_stride=4)
    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", "off")
    monkeypatch.delenv("RGT_TEXTURE_BUILD", raising=False)
    compact = scan_fast.build_range_texture(tmap, cfg)
    monkeypatch.setenv("RGT_TEXTURE_BUILD", "dense")
    dense = scan_fast.build_range_texture(tmap, cfg)
    np.testing.assert_array_equal(np.asarray(compact.rt),
                                  np.asarray(dense.rt))
    np.testing.assert_array_equal(np.asarray(compact.valid),
                                  np.asarray(dense.valid))


def test_texture_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The marched texture memoizes to disk by content hash: a rebuild with
    the same map+config loads bit-identical arrays; changing the config
    (including the occlusion/grad channel recipe) misses; disabling via
    env var builds fresh."""
    import dataclasses

    tmap = _tiny_tmap()
    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", "off")
    fresh = scan_fast.build_range_texture(tmap, CFG)

    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", str(tmp_path))
    r1 = scan_fast.build_range_texture(tmap, CFG)
    files = list(tmp_path.glob("rtex_*.npz"))
    assert len(files) == 1
    r2 = scan_fast.build_range_texture(tmap, CFG)   # cache hit
    np.testing.assert_array_equal(np.asarray(r1.rt), np.asarray(r2.rt))
    np.testing.assert_array_equal(np.asarray(r1.valid), np.asarray(r2.valid))
    # matches the cache-disabled build too
    np.testing.assert_array_equal(np.asarray(r1.rt), np.asarray(fresh.rt))

    cfg2 = dataclasses.replace(CFG, rt_theta_bins=16)
    scan_fast.build_range_texture(tmap, cfg2)
    assert len(list(tmp_path.glob("rtex_*.npz"))) == 2, "config change must miss"

    # channel-recipe change (edge/grad) must also miss — stale single-
    # channel entries would break the runtime layout assert
    cfg3 = dataclasses.replace(CFG, rt_occlusion="edge", rt_grad=True)
    r4 = scan_fast.build_range_texture(tmap, cfg3)
    assert len(list(tmp_path.glob("rtex_*.npz"))) == 3
    assert r4.rt.shape[-1] == 5 * CFG.rt_theta_bins


@pytest.mark.slow  # ablation-only spatial mode; full lane covers it
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


# ---------------------------------------------------------------------------
# round-3 occlusion/gradient channel modes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_edge():
    tmap = load_map(MAP_YAML, ".png", dtype=jnp.float64)
    tables = scan_ops.build_tables(CFG_EDGE, 0.31, 0.58, dtype=jnp.float64)
    rtex = scan_fast.build_range_texture(tmap, CFG_EDGE)
    return tmap, tables, rtex


def _free_poses(tmap, n, seed, clearance=0.5):
    rng = np.random.default_rng(seed)
    dt_np = np.asarray(tmap.dt)
    res = float(tmap.resolution)
    poses = []
    while len(poses) < n:
        r, c = rng.integers(0, dt_np.shape[0]), rng.integers(0, dt_np.shape[1])
        if dt_np[r, c] > clearance:
            poses.append([c * res + float(tmap.orig_x) + res / 2,
                          r * res + float(tmap.orig_y) + res / 2,
                          rng.uniform(0, 2 * np.pi)])
    return jnp.asarray(poses)


def test_edge_texture_channels(setup_edge):
    """Edge mode textures carry [R | e w | gx gy]; e in [0,1], w in [0,1],
    |grad| clamped, occupied rows all-zero."""
    tmap, tables, rtex = setup_edge
    t = CFG_EDGE.rt_theta_bins
    assert CFG_EDGE.rt_channels == 5
    assert rtex.rt.shape[-1] == 5 * t
    rt = np.asarray(rtex.rt)
    valid = np.asarray(rtex.valid)
    e, w = rt[valid, t:2 * t], rt[valid, 2 * t:3 * t]
    g = rt[valid, 3 * t:]
    assert e.min() >= 0.0 and e.max() <= 1.0
    assert w.min() >= 0.0 and w.max() <= 1.0
    assert np.abs(g).max() <= 8.0 + 1e-6
    assert np.all(rt[~valid] == 0.0)


@pytest.mark.parametrize("spatial", [
    "nearest1",
    pytest.param("bilinear", marks=pytest.mark.slow),  # non-default spatial
])
def test_edge_mode_variants_agree(setup_edge, spatial):
    """trace_fast (element gather) == trace_fast_mxu (matmul pipeline) in
    the full edge+grad configuration, both spatial modes."""
    import dataclasses

    tmap, tables, rtex = setup_edge
    cfg = dataclasses.replace(CFG_EDGE, rt_spatial=spatial)
    poses = _free_poses(tmap, 10, seed=13)
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, cfg))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-7)


@pytest.mark.slow  # ~45s interpret-mode kernel; the fast lane keeps the
# STEP-level fused parity (test_fused_ttc_env_step_matches_unfused)
def test_pallas_edge_epilogue_matches_xla(setup_edge):
    """The fused edge kernel (interpret mode off TPU) matches the XLA edge
    path, including under vmap.  Both epilogues resolve cfg.rt_ew_dtype by
    the same rule (scan_fast._resolve_ew_dtype), so at the off-TPU "auto"
    default the channel-tap matmuls run at the scan dtype on BOTH backends
    and the scans agree to fp tolerance.  With an explicit
    rt_ew_dtype="bfloat16" a beam whose frac falls inside the bf16-shifted
    (2^-8 relative) ramp window can legitimately land on the other side of
    a hard visibility edge, so that case gates the bulk tightly and the
    flipped fraction separately."""
    import dataclasses

    tmap, tables, rtex = setup_edge
    cfg_x = dataclasses.replace(CFG_EDGE, scan_backend="xla")
    cfg_p = dataclasses.replace(CFG_EDGE, scan_backend="pallas")
    poses = _free_poses(tmap, 10, seed=29)
    a = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_x))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg_p))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # explicit bf16 channel taps: bounded edge-flip budget vs the f64 XLA
    # render (the on-TPU "auto" error class)
    cfg_b = dataclasses.replace(CFG_EDGE, scan_backend="pallas",
                                rt_ew_dtype="bfloat16")
    bb = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex,
                                             cfg_b))
    err = np.abs(a - bb)
    cell = float(rtex.cell)
    assert np.quantile(err, 0.99) < 0.5 * cell, f"p99 {np.quantile(err, 0.99)}"
    assert np.mean(err > 4 * cell) < 2e-3, f"flips {np.mean(err > 4 * cell)}"

    # vmapped composition (custom_vmap collapses batch axes into rows)
    pv = poses.reshape(5, 2, 3)
    f_p = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_p)))
    bv = np.asarray(f_p(pv)).reshape(10, -1)
    np.testing.assert_allclose(bv, b, rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~33s interpret-mode kernel; step-level parity stays fast
def test_fused_ttc_epilogue_matches_unfused(setup_edge):
    """The fused noise+iTTC edge kernel (fuse_scan_ttc) returns the same
    noisy scan and hit flags as pallas-edge + XLA noise add + check_ttc —
    identical math, so the comparison is tight even through interpret
    mode."""
    import dataclasses

    from red_gym_tpu.ops import agent_scan

    tmap, tables, rtex = setup_edge
    # generous iTTC horizon so the random free-space poses produce hits AND
    # misses (at the shipped 5 ms horizon only near-wall poses hit)
    cfg = dataclasses.replace(CFG_EDGE, scan_backend="pallas",
                              ttc_thresh=2.0)
    e_n, a_n = 5, 2
    pv = _free_poses(tmap, e_n * a_n, seed=31).reshape(e_n, a_n, 3)
    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.normal(0.0, 0.01, (e_n, cfg.num_beams)))
    # velocities spanning both iTTC sign branches and the vel == 0 freeze
    vel = jnp.asarray([[0.0, 5.0], [-3.0, 6.0], [4.0, -1.0],
                       [6.0, 6.0], [0.2, 3.0]])

    fused = jax.jit(jax.vmap(
        lambda po, no, ve: scan_fast.trace_fast_mxu(
            po, tables, tmap, rtex, cfg, fused_ttc=(no, ve))))
    scans_f, hit01 = fused(pv, noise, vel)
    hit_f = np.asarray((hit01 > 0) & (vel != 0.0))

    plain = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg)))
    scans_u = plain(pv) + noise[:, None, :]
    hit_u = np.asarray(agent_scan.check_ttc(scans_u, vel, tables,
                                            cfg.ttc_thresh))

    np.testing.assert_allclose(np.asarray(scans_f), np.asarray(scans_u),
                               rtol=1e-6, atol=1e-6)
    # a hit flag can only legitimately differ if some beam sits within
    # float rounding of the iTTC inequality boundary; with these smooth
    # inputs none do
    np.testing.assert_array_equal(hit_f, hit_u)
    # contract guard: at least one hit and one miss among moving agents
    moving = np.asarray(vel != 0.0)
    assert hit_u[moving].any() and (~hit_u[moving]).any(), \
        "degenerate fixture: iTTC outcomes not exercised both ways"


def test_fused_ttc_spectral_matches_unfused(setup):
    """The fused spectral kernel (theta_spectral_ttc) == XLA spectral render
    + noise add + check_ttc.  The contraction dim is untiled, so the matmul
    reduction order matches XLA's and the comparison is tight."""
    import dataclasses

    from red_gym_tpu.ops import agent_scan

    tmap, tables, rtex = setup
    cfg = dataclasses.replace(CFG, scan_interp="spectral",
                              scan_backend="pallas", ttc_thresh=2.0)
    e_n, a_n = 4, 2
    pv = _free_poses(tmap, e_n * a_n, seed=23).reshape(e_n, a_n, 3)
    rng = np.random.default_rng(5)
    noise = jnp.asarray(rng.normal(0.0, 0.01, (e_n, cfg.num_beams)))
    vel = jnp.asarray([[0.0, 5.0], [-3.0, 6.0], [4.0, -1.0], [6.0, 2.0]])

    fused = jax.jit(jax.vmap(
        lambda po, no, ve: scan_fast.trace_fast_mxu(
            po, tables, tmap, rtex, cfg, fused_ttc=(no, ve))))
    scans_f, hit01 = fused(pv, noise, vel)
    hit_f = np.asarray((hit01 > 0) & (vel != 0.0))

    cfg_x = dataclasses.replace(cfg, scan_backend="xla")
    plain = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_x)))
    scans_u = plain(pv) + noise[:, None, :]
    hit_u = np.asarray(agent_scan.check_ttc(scans_u, vel, tables,
                                            cfg.ttc_thresh))

    np.testing.assert_allclose(np.asarray(scans_f), np.asarray(scans_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(hit_f, hit_u)
    moving = np.asarray(vel != 0.0)
    assert hit_u[moving].any() and (~hit_u[moving]).any(), \
        "degenerate fixture: iTTC outcomes not exercised both ways"


def test_fused_ttc_env_step_matches_unfused():
    """One full env step with fuse_scan_ttc='on' (pallas interpret) equals
    the unfused pallas path: same RNG stream, same scans/state/collisions."""
    import dataclasses

    cfg = SimConfig(num_agents=2, num_beams=270, dtype="float32",
                    scan_mode="fast", rt_theta_bins=128, rt_pose_stride=8,
                    scan_backend="pallas", fuse_scan_ttc="on")
    assert scan_fast.use_fused_ttc(cfg)
    tmap32 = load_map(MAP_YAML, ".png", dtype=jnp.float32)
    params = envlib.make_params(cfg, MAP_YAML, ".png")
    del tmap32
    poses = jnp.asarray([[0.7, 0.0, 1.37], [0.7, -1.0, 1.37]], jnp.float32)
    actions = jnp.asarray([[0.1, 3.0], [-0.1, 2.0]], jnp.float32)

    outs = {}
    for name, mut in (("fused", {}), ("plain", {"fuse_scan_ttc": "off"})):
        ci = dataclasses.replace(cfg, **mut)
        state = envlib.init_state(ci, poses, jax.random.PRNGKey(7))
        # a couple of steps so velocity is nonzero when iTTC runs
        for _ in range(3):
            state, obs, rew, done, info = jax.jit(
                lambda s, a: envlib.step(ci, params, s, a))(state, actions)
        outs[name] = (np.asarray(obs.scans), np.asarray(state.x),
                      np.asarray(state.collisions))
    for a, b in zip(outs["fused"], outs["plain"]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_snap_mode_variants_agree(setup):
    """rt_occlusion='snap' needs no extra channels and the two variants
    agree (the plain single-channel texture serves it)."""
    import dataclasses

    tmap, tables, rtex = setup
    cfg = dataclasses.replace(CFG, rt_occlusion="snap")
    assert cfg.rt_channels == 1
    poses = _free_poses(tmap, 8, seed=17)
    a = np.asarray(scan_fast.trace_fast(poses, tables, tmap, rtex, cfg))
    b = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap, rtex, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)


def test_edge_mode_cuts_occlusion_tail(setup_edge):
    """The whole point of the e/w channels: the occlusion-edge error tail
    collapses vs plain lerp on the SAME texture grid (p99 and the >4-cell
    fraction both improve)."""
    tmap, tables, rtex_edge = setup_edge
    rtex_off = scan_fast.build_range_texture(tmap, CFG_OFF8)
    poses = _free_poses(tmap, 24, seed=19, clearance=0.3)
    exact = np.asarray(scan_ops.trace(poses, tables, tmap, CFG_OFF8))
    off = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap,
                                              rtex_off, CFG_OFF8))
    edge = np.asarray(scan_fast.trace_fast_mxu(poses, tables, tmap,
                                               rtex_edge, CFG_EDGE))
    err_off = np.abs(exact - off)
    err_edge = np.abs(exact - edge)
    cell = float(rtex_off.cell)
    assert np.quantile(err_edge, 0.99) < 0.7 * np.quantile(err_off, 0.99)
    assert np.mean(err_edge > 4 * cell) < np.mean(err_off > 4 * cell)


def test_pallas_rejects_snap_mode():
    with pytest.raises(ValueError, match="pallas"):
        SimConfig(scan_backend="pallas", rt_occlusion="snap")
    # off and edge both have fused kernels; spectral neutralizes occlusion
    SimConfig(scan_backend="pallas", rt_occlusion="edge", rt_grad=True)
    SimConfig(scan_backend="pallas", rt_occlusion="off", rt_grad=True)
    SimConfig(scan_backend="pallas", scan_interp="spectral",
              rt_occlusion="edge", rt_grad=False)


def test_channel_mismatch_raises(setup, setup_edge):
    """A texture built for one channel layout refuses to serve a config
    expecting another (silent misindexing would be catastrophic)."""
    tmap, tables, rtex_off = setup
    _, _, rtex_edge = setup_edge
    poses = _free_poses(tmap, 2, seed=23)
    with pytest.raises(AssertionError, match="channels"):
        scan_fast.trace_fast_mxu(poses, tables, tmap, rtex_off, CFG_EDGE)
    with pytest.raises(AssertionError, match="channels"):
        scan_fast.trace_fast(poses, tables, tmap, rtex_edge, CFG)


@pytest.mark.slow  # multi-map x edge-channel composition; full lane
def test_edge_channels_with_stacked_maps():
    """Map-STACKED textures carry the edge/grad channels per map: tracing
    with midx=i equals tracing the unstacked texture of map i (the flat-row
    offset indexing must stride by C*T rows correctly)."""
    import jax

    maps = [_tiny_tmap(seed=3, n=40), _tiny_tmap(seed=4, n=40)]
    cfg = SimConfig(num_agents=1, num_beams=90, dtype="float64",
                    scan_mode="fast", rt_theta_bins=32, rt_pose_stride=2,
                    rt_occlusion="edge", rt_grad=True)
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)
    rtexs = [scan_fast.build_range_texture(m, cfg) for m in maps]
    stacked_rt = scan_fast.stack_textures(rtexs)
    from red_gym_tpu.maps.loader import stack_maps
    stacked_map = stack_maps(maps)

    rng = np.random.default_rng(9)
    for i, (m, rt) in enumerate(zip(maps, rtexs)):
        poses = []
        dt_np = np.asarray(m.dt)
        while len(poses) < 5:
            r, c = rng.integers(0, 40, 2)
            if dt_np[r, c] > 0.6:
                poses.append([c * 0.25 + 0.125, r * 0.25 + 0.125,
                              rng.uniform(0, 2 * np.pi)])
        poses = jnp.asarray(poses)
        want = np.asarray(scan_fast.trace_fast_mxu(poses, tables, m, rt, cfg))
        got = np.asarray(jax.vmap(
            lambda p: scan_fast.trace_fast_mxu(
                p, tables, stacked_map, stacked_rt, cfg,
                midx=jnp.asarray(i, jnp.int32)))(poses))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_pad_texture_equals_padded_map_build():
    """pad_texture(build(raw)) is BIT-EQUAL to build(zero-padded map) for
    wall-bounded maps: padded cells are occupied, so their rows are zero
    with valid=False either way, and in-bounds marches terminate at real
    walls before the boundary.  This equivalence is what lets
    make_multimap_params build textures on the RAW maps (stable disk-cache
    key) and pad afterwards — before, any change to a stack's max
    dimensions re-marched every member map."""
    m_raw = _tiny_tmap(seed=7, n=40)
    ph, pw = 56, 64
    m_pad = m_raw._replace(
        dt=jnp.pad(m_raw.dt, ((0, ph - 40), (0, pw - 40))),
        occupancy=jnp.pad(m_raw.occupancy, ((0, ph - 40), (0, pw - 40))))

    cfg = SimConfig(num_agents=1, num_beams=90, dtype="float64",
                    scan_mode="fast", rt_theta_bins=16, rt_pose_stride=4,
                    rt_occlusion="edge", rt_grad=True, rt_edge_iters=3)
    s = cfg.rt_pose_stride
    a = scan_fast.pad_texture(scan_fast.build_range_texture(m_raw, cfg),
                              (ph + s - 1) // s, (pw + s - 1) // s)
    b = scan_fast.build_range_texture(m_pad, cfg)
    assert (int(a.hc), int(a.wc)) == (int(b.hc), int(b.wc))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.rt), np.asarray(b.rt))
    # no-op and shrink guards
    t = scan_fast.build_range_texture(m_raw, cfg)
    assert scan_fast.pad_texture(t, int(t.hc), int(t.wc)) is t
    with pytest.raises(ValueError):
        scan_fast.pad_texture(t, int(t.hc) - 1, int(t.wc))


def test_fused_opp_epilogue_matches_unfused(setup_edge):
    """The fully-fused epilogue (fuse_scan_opp: edge render + noise + iTTC
    + opponent ray cast in one kernel) matches pallas-edge + XLA noise +
    check_ttc + ray_cast_all_opponents.  The in-kernel slab test folds the
    heading rotation into the box axes (algebraically identical to
    agent_scan.ray_cast_opponent, float-associated differently), so scans
    carry an fp tolerance; a beam can only disagree beyond it at a grazing
    box-corner hit, which these fixtures avoid."""
    import dataclasses

    from red_gym_tpu.ops import agent_scan, collision as col

    tmap, tables, rtex = setup_edge
    cfg = dataclasses.replace(CFG_EDGE, scan_backend="pallas",
                              ttc_thresh=2.0, num_agents=2)
    e_n, a_n = 4, 2
    rng = np.random.default_rng(5)
    base = _free_poses(tmap, e_n, seed=37)
    # opponent placed 1-3 m ahead-ish of the ego so the blocked window and
    # slab hits are actually exercised
    opp_off = rng.uniform(-2.5, 2.5, (e_n, 2))
    opp_pose = np.stack([base[:, 0] + opp_off[:, 0],
                         base[:, 1] + opp_off[:, 1],
                         rng.uniform(0, 2 * np.pi, e_n)], axis=-1)
    pv = jnp.asarray(np.stack([base, opp_pose], axis=1))     # (E, A, 3)
    noise = jnp.asarray(rng.normal(0.0, 0.01, (e_n, cfg.num_beams)))
    vel = jnp.asarray(rng.uniform(-2.0, 6.0, (e_n, a_n)))

    length, width = 0.58, 0.31

    def fused_one(po, no, ve):
        verts = col.get_vertices(po, length, width)
        opp = agent_scan.opponent_slab_scalars(po, verts, tables)
        return scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg,
                                        fused_ttc=(no, ve, opp))

    scans_f, hit01 = jax.jit(jax.vmap(fused_one))(pv, noise, vel)
    hit_f = np.asarray((hit01 > 0) & (vel != 0.0))

    plain = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg)))
    scans_n = plain(pv) + noise[:, None, :]
    hit_u = np.asarray(agent_scan.check_ttc(scans_n, vel, tables,
                                            cfg.ttc_thresh))

    def opp_one(po, sc):
        verts = col.get_vertices(po, length, width)
        return agent_scan.ray_cast_all_opponents(po, sc, verts, tables)

    scans_u = jax.jit(jax.vmap(opp_one))(pv, scans_n)

    np.testing.assert_allclose(np.asarray(scans_f), np.asarray(scans_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(hit_f, hit_u)
    # contract guard: the opponent cast actually shortened some beams
    assert (np.asarray(scans_u) < np.asarray(scans_n) - 1e-6).any(), \
        "degenerate fixture: no beam blocked by an opponent"


def test_megakernel_matches_unfused():
    """The one-launch megakernel (scan_megakernel: raw gathered rows ->
    corrections + parallax + DFT roll + taps + render + noise + iTTC in one
    Pallas program) matches the XLA pipeline + fused epilogue.  The kernel
    computes the same formulas with different float association (pre-rolled
    constant matrices instead of packed-lane slicing, in-kernel trig), so
    scans are compared at fp tolerance with a small edge-flip budget, and
    hits exactly.  Runs in FLOAT32 (the megakernel's only dtype — it is the
    library-default throughput path) on a fresh stride-8 texture."""
    import dataclasses

    from red_gym_tpu.ops import agent_scan

    cfg_x = dataclasses.replace(CFG_EDGE, dtype="float32",
                                scan_backend="xla", ttc_thresh=2.0)
    tmap = load_map(MAP_YAML, ".png", dtype=jnp.float32)
    tables = scan_ops.build_tables(cfg_x, 0.31, 0.58, dtype=jnp.float32)
    rtex = scan_fast.build_range_texture(tmap, cfg_x)
    cfg_m = dataclasses.replace(cfg_x, scan_backend="pallas",
                                scan_megakernel="on")
    # 160 envs x 2 agents = 320 rows -> TWO row tiles at the mega
    # ROW_TILE=256: regression for the round-5 beam_tile bug, where the
    # iTTC beam mask keyed on pl.program_id(0) (the ROW tile under mega's
    # 1-D grid) and silently zeroed every hit beyond the first tile
    e_n, a_n = 160, 2
    pv = _free_poses(tmap, e_n * a_n, seed=41).reshape(e_n, a_n, 3)
    rng = np.random.default_rng(9)
    noise = jnp.asarray(rng.normal(0.0, 0.01, (e_n, cfg_m.num_beams)),
                        jnp.float32)
    vel = jnp.asarray(rng.uniform(-2.0, 6.0, (e_n, a_n)), jnp.float32)

    mega = jax.jit(jax.vmap(
        lambda po, no, ve: scan_fast.trace_fast_mxu(
            po, tables, tmap, rtex, cfg_m, fused_ttc=(no, ve))))
    scans_m, hit01 = mega(pv, noise, vel)
    hit_m = np.asarray((hit01 > 0) & (vel != 0.0))

    plain = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_x)))
    scans_u = plain(pv) + noise[:, None, :]
    hit_u = np.asarray(agent_scan.check_ttc(scans_u, vel, tables,
                                            cfg_x.ttc_thresh))

    err = np.abs(np.asarray(scans_m) - np.asarray(scans_u))
    cell = float(rtex.cell)
    # bulk must agree to float-reassociation tolerance; a beam whose frac
    # sits within trig-rounding of a hard edge may land on the other side
    assert np.quantile(err, 0.99) < 1e-3, np.quantile(err, 0.99)
    assert np.mean(err > 4 * cell) < 2e-3, np.mean(err > 4 * cell)
    np.testing.assert_array_equal(hit_m, hit_u)
    # fixture guard: the second row tile must actually contain hits, or the
    # beam_tile regression above would pass vacuously
    assert hit_u[128:].any(), "no iTTC hits beyond the first row tile"


def test_megakernel_opp_matches_unfused():
    """Mega + in-kernel opponent ray cast (fuse_scan_opp with the
    megakernel) vs the XLA pipeline + XLA opponent pass."""
    import dataclasses

    from red_gym_tpu.ops import agent_scan, collision as col

    cfg_x = dataclasses.replace(CFG_EDGE, dtype="float32",
                                scan_backend="xla", ttc_thresh=2.0,
                                num_agents=2)
    tmap = load_map(MAP_YAML, ".png", dtype=jnp.float32)
    tables = scan_ops.build_tables(cfg_x, 0.31, 0.58, dtype=jnp.float32)
    rtex = scan_fast.build_range_texture(tmap, cfg_x)
    cfg_m = dataclasses.replace(cfg_x, scan_backend="pallas",
                                scan_megakernel="on", fuse_scan_opp="on")
    e_n, a_n = 4, 2
    rng = np.random.default_rng(15)
    base = _free_poses(tmap, e_n, seed=43)
    opp_pose = np.stack([base[:, 0] + rng.uniform(-2.5, 2.5, e_n),
                         base[:, 1] + rng.uniform(-2.5, 2.5, e_n),
                         rng.uniform(0, 2 * np.pi, e_n)], axis=-1)
    pv = jnp.asarray(np.stack([base, opp_pose], axis=1), jnp.float32)
    noise = jnp.asarray(rng.normal(0.0, 0.01, (e_n, cfg_m.num_beams)),
                        jnp.float32)
    vel = jnp.asarray(rng.uniform(-2.0, 6.0, (e_n, a_n)), jnp.float32)
    length, width = 0.58, 0.31

    def mega_one(po, no, ve):
        verts = col.get_vertices(po, length, width)
        opp = agent_scan.opponent_slab_scalars(po, verts, tables)
        return scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_m,
                                        fused_ttc=(no, ve, opp))

    scans_m, hit01 = jax.jit(jax.vmap(mega_one))(pv, noise, vel)
    hit_m = np.asarray((hit01 > 0) & (vel != 0.0))

    plain = jax.jit(jax.vmap(
        lambda po: scan_fast.trace_fast_mxu(po, tables, tmap, rtex, cfg_x)))
    scans_n = plain(pv) + noise[:, None, :]
    hit_u = np.asarray(agent_scan.check_ttc(scans_n, vel, tables,
                                            cfg_x.ttc_thresh))

    def opp_one(po, sc):
        verts = col.get_vertices(po, length, width)
        return agent_scan.ray_cast_all_opponents(po, sc, verts, tables)

    scans_u = jax.jit(jax.vmap(opp_one))(pv, scans_n)
    err = np.abs(np.asarray(scans_m) - np.asarray(scans_u))
    cell = float(rtex.cell)
    assert np.quantile(err, 0.99) < 1e-3, np.quantile(err, 0.99)
    assert np.mean(err > 4 * cell) < 2e-3, np.mean(err > 4 * cell)
    np.testing.assert_array_equal(hit_m, hit_u)
    assert (np.asarray(scans_u) < np.asarray(scans_n) - 1e-6).any()


def test_megakernel_pool_rot_matches_slab():
    """noise_mode='pool_rot': the megakernel rotation-addresses a
    VMEM-resident noise pool (env g reads row (g + off) % rows with off =
    env 0's draw) instead of consuming a pre-materialized (E, B) slab.
    Feeding the SAME rows through the slab path must match BIT-exactly —
    the two paths differ only in how the rows reach the kernel.  160 envs
    span two row tiles, so the rotation's per-tile slice offset (tile *
    tile_envs + off) and the wrap seam both get exercised."""
    import dataclasses

    cfg_x = dataclasses.replace(CFG_EDGE, dtype="float32",
                                scan_backend="xla", ttc_thresh=2.0)
    tmap = load_map(MAP_YAML, ".png", dtype=jnp.float32)
    tables = scan_ops.build_tables(cfg_x, 0.31, 0.58, dtype=jnp.float32)
    rtex = scan_fast.build_range_texture(tmap, cfg_x)
    cfg_m = dataclasses.replace(cfg_x, scan_backend="pallas",
                                scan_megakernel="on",
                                noise_mode="pool_rot", noise_pool_rows=256)
    e_n, a_n = 160, 2
    pv = _free_poses(tmap, e_n * a_n, seed=41).reshape(e_n, a_n, 3)
    rng = np.random.default_rng(7)
    vel = jnp.asarray(rng.uniform(-2.0, 6.0, (e_n, a_n)), jnp.float32)
    rows = cfg_m.noise_pool_rows
    pool = jnp.asarray(rng.normal(0.0, 0.01, (rows, cfg_m.num_beams)),
                       jnp.float32).astype(jnp.bfloat16)
    pad = min(256, rows)
    tables_rot = tables._replace(
        noise_pool_ext=jnp.concatenate([pool, pool[:pad]], axis=0))
    # off large enough that the tile slices cross the wrap seam, and NOT a
    # multiple of 16 so the sublane-alignment quantization is exercised
    off = rows - 37
    ridx = jnp.full((e_n, 1), off, jnp.int32)  # only [0, 0] is read

    rot = jax.jit(jax.vmap(
        lambda po, no, ve: scan_fast.trace_fast_mxu(
            po, tables_rot, tmap, rtex, cfg_m, fused_ttc=(no, ve))))
    scans_r, hit_r = rot(pv, ridx, vel)

    off_q = off & ~15  # the kernel quantizes the offset to multiples of 16
    slab = pool[(jnp.arange(e_n) + off_q) % rows]          # (E, B) bf16
    cfg_s = dataclasses.replace(cfg_m, noise_mode="pool")
    ref = jax.jit(jax.vmap(
        lambda po, no, ve: scan_fast.trace_fast_mxu(
            po, tables, tmap, rtex, cfg_s, fused_ttc=(no, ve))))
    scans_s, hit_s = ref(pv, slab, vel)

    np.testing.assert_array_equal(np.asarray(scans_r), np.asarray(scans_s))
    np.testing.assert_array_equal(np.asarray(hit_r), np.asarray(hit_s))
    assert np.asarray(hit_s).any(), "degenerate fixture: no iTTC hits"


def test_state_kernel_matches_xla_chain():
    """cfg.state_kernel='on': the fused pre-scan Pallas kernel (steer
    delay + PID + RK4 + yaw wrap + scan-geometry prep in ONE launch,
    ops/pallas_state.py) must reproduce the XLA chain BIT-exactly through
    a full env.step — it calls the same jnp functions in the same order on
    a transposed layout.  Multi-step closed loop so the delay line, the
    kernel-carried state and the pregeo-fed megakernel all cycle."""
    import dataclasses

    cfg_off = SimConfig(num_agents=2, num_beams=270, dtype="float32",
                        scan_mode="fast", rt_theta_bins=128,
                        rt_pose_stride=8, rt_occlusion="edge", rt_grad=True,
                        scan_backend="pallas", scan_megakernel="on",
                        fuse_scan_ttc="on", state_kernel="off")
    cfg_on = dataclasses.replace(cfg_off, state_kernel="on")
    params = envlib.make_params(cfg_off, MAP_YAML, ".png")

    E = 6
    poses = jnp.tile(jnp.asarray([[0.7, 0.0, 1.37], [0.7, -1.0, 1.37]],
                                 jnp.float32), (E, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(11), E)

    def roll(cfg):
        reset_v = jax.jit(jax.vmap(
            lambda po, k: envlib.reset(cfg, params, po, k)))
        step_v = jax.jit(jax.vmap(
            lambda s, a: envlib.step(cfg, params, s, a)))
        s, o, *_ = reset_v(poses, keys)
        outs = []
        for t in range(5):
            a = jnp.full((E, 2, 2), 0.1 * (t + 1), jnp.float32)
            s, o, r, d, _ = step_v(s, a)
            outs.append((o.scans, o.poses_x, o.poses_theta, o.collisions))
        return s, outs

    s_off, o_off = roll(cfg_off)
    s_on, o_on = roll(cfg_on)
    for (a, b) in zip(o_off, o_on):
        for u, v in zip(a, b):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(s_off.x), np.asarray(s_on.x))
    np.testing.assert_array_equal(np.asarray(s_off.steer_buf),
                                  np.asarray(s_on.steer_buf))
    np.testing.assert_array_equal(np.asarray(s_off.steer_cnt),
                                  np.asarray(s_on.steer_cnt))
