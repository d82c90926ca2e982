"""iTTC and opponent-raycast parity tests vs the reference kernels."""

import numpy as np
import jax.numpy as jnp

from red_gym_tpu.config import SimConfig
from red_gym_tpu.ops import agent_scan, collision as col
from red_gym_tpu.ops.scan import build_tables

CFG = SimConfig(num_beams=1080, dtype="float64")


def _tables():
    return build_tables(CFG, width=0.31, length=0.58, dtype=jnp.float64)


def test_side_distances_match_reference(reference):
    """Our vectorized per-beam side-distance table equals the reference's
    quadrant loop (base_classes.py:116-156)."""
    rc = reference.base_classes.RaceCar
    # force a fresh class-level precompute
    rc.scan_simulator = None
    params = {"width": 0.31, "length": 0.58, "lf": 0.15875, "lr": 0.17145,
              "mu": 1.0489, "C_Sf": 4.718, "C_Sr": 5.4562, "h": 0.074,
              "m": 3.74, "I": 0.04712, "s_min": -0.4189, "s_max": 0.4189,
              "sv_min": -3.2, "sv_max": 3.2, "v_switch": 7.319, "a_max": 9.51,
              "v_min": -5.0, "v_max": 20.0}
    reference.base_classes.RaceCar(params, seed=123, fov=2 * np.pi)
    t = _tables()
    # reference table: dist to edge uses width/2 and (lf+lr)/2
    ours = build_tables(CFG, width=0.31, length=0.15875 + 0.17145, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(ours.side_distances), rc.side_distances)
    np.testing.assert_array_equal(np.asarray(t.scan_angles), rc.scan_angles)
    np.testing.assert_array_equal(np.asarray(t.beam_cosines), rc.cosines)
    rc.scan_simulator = None  # leave pristine for other tests


def test_ttc_parity(reference):
    lm = reference.laser_models
    t = _tables()
    rng = np.random.default_rng(0)
    angles = np.asarray(t.scan_angles)
    cosines = np.asarray(t.beam_cosines)
    side = np.asarray(t.side_distances)
    for _ in range(50):
        scan = rng.uniform(0.0, 5.0, 1080)
        vel = rng.choice([0.0, rng.uniform(-8, 8)])
        if rng.random() < 0.5:
            # force some near-collision beams
            idx = rng.integers(0, 1080, 5)
            scan[idx] = side[idx] + rng.uniform(0, 0.02, 5)
        want = lm.check_ttc_jit(scan, vel, angles, cosines, side, 0.005)
        got = bool(agent_scan.check_ttc(jnp.asarray(scan), jnp.float64(vel), t, 0.005))
        assert got == want


def test_ray_cast_parity(reference):
    """Full-beam masked opponent raycast equals the reference windowed loop
    beam-for-beam (laser_models.py:283-346)."""
    lm = reference.laser_models
    cm = reference.collision_models
    t = _tables()
    rng = np.random.default_rng(1)
    angles = np.asarray(t.scan_angles)
    for _ in range(40):
        pose = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                         rng.uniform(0, 2 * np.pi)])
        opp_pose = pose[:2] + rng.uniform(-2.0, 2.0, 2)
        opp = np.array([opp_pose[0], opp_pose[1], rng.uniform(0, 2 * np.pi)])
        verts = cm.get_vertices(opp, 0.58, 0.31)
        scan0 = rng.uniform(0.5, 10.0, 1080)

        want = lm.ray_cast(pose.copy(), scan0.copy(), angles, verts)
        got = np.asarray(agent_scan.ray_cast_opponent(
            jnp.asarray(pose), jnp.asarray(scan0), jnp.asarray(verts), t))
        # XLA fuses the cross-product mul/add chains into FMAs, so agreement
        # is to the last ulp rather than bit-exact.
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=0)


def test_multi_opponent_matches_sequential(reference):
    """ray_cast_all_opponents == the reference's sequential per-opponent
    in-place loop (base_classes.py:204-225)."""
    lm = reference.laser_models
    cm = reference.collision_models
    t = _tables()
    rng = np.random.default_rng(2)
    A = 4
    poses = np.stack([rng.uniform(-2, 2, A), rng.uniform(-2, 2, A),
                      rng.uniform(0, 2 * np.pi, A)], axis=-1)
    verts = np.stack([cm.get_vertices(p, 0.58, 0.31) for p in poses])
    scans = rng.uniform(0.5, 10.0, (A, 1080))

    want = scans.copy()
    for i in range(A):
        new_scan = want[i]
        for j in range(A):
            if j == i:
                continue
            new_scan = lm.ray_cast(poses[i].copy(), new_scan, np.asarray(t.scan_angles), verts[j])
        want[i] = new_scan

    got = np.asarray(agent_scan.ray_cast_all_opponents(
        jnp.asarray(poses), jnp.asarray(scans), jnp.asarray(verts), t))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=0)


def test_vertices_pipeline_consistency():
    """get_vertices feeding the raycast: an opponent dead ahead shortens the
    forward beams to roughly the gap distance."""
    t = _tables()
    pose = jnp.asarray([0.0, 0.0, 0.0], dtype=jnp.float64)
    opp = jnp.asarray([2.0, 0.0, 0.0], dtype=jnp.float64)
    verts = col.get_vertices(opp, 0.58, 0.31)
    scan0 = jnp.full((1080,), 30.0, dtype=jnp.float64)
    out = np.asarray(agent_scan.ray_cast_opponent(pose, scan0, verts, t))
    # forward beam (angle ~0) is beam B/2 for fov=2pi
    fwd = out[540]
    assert abs(fwd - (2.0 - 0.29)) < 0.05  # 2m gap minus half car length
    assert out.min() > 1.5 and (out == 30.0).sum() > 800


def test_batched_opponent_axis_matches_loop():
    """A > 4 dispatches the batched (A-1, A) opponent formulation
    (ray_cast_all_opponents); it must equal the A<=4 rolled loop it
    replaces bit-for-bit modulo min-accumulation order (exact here: the
    same float min over the same operands commutes)."""
    t = _tables()
    rng = np.random.default_rng(11)
    for A in (5, 8):   # (A=12 also verified; trimmed for fast-lane time)
        poses = np.stack([rng.uniform(-3, 3, A), rng.uniform(-3, 3, A),
                          rng.uniform(0, 2 * np.pi, A)], axis=-1)
        verts = np.asarray(col.get_vertices(jnp.asarray(poses), 0.58, 0.31))
        scans = rng.uniform(0.5, 10.0, (A, 1080))

        # the rolled sequential form, inline (what A<=4 runs)
        dirs = agent_scan.beam_dirs(jnp.asarray(poses)[..., 2], t)
        want = jnp.asarray(scans)
        for k in range(1, A):
            want = agent_scan.ray_cast_opponent(
                jnp.asarray(poses), want, jnp.roll(jnp.asarray(verts), -k,
                                                   axis=0), t, dirs)

        got = agent_scan.ray_cast_all_opponents(
            jnp.asarray(poses), jnp.asarray(scans), jnp.asarray(verts), t)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"A={A}")
