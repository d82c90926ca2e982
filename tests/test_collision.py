"""Collision layer tests: SAT vs the reference GJK oracle.

Mirrors the reference's geometry tests (reference:
gym/f110_gym/envs/collision_models.py:263-336): perturbed-self collisions,
a pairwise body matrix with expected partners, plus randomized fuzz parity.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from red_gym_tpu.ops import collision as col


def _rand_pose_verts(rng, n, spread=4.0):
    poses = np.stack(
        [rng.uniform(-spread, spread, n), rng.uniform(-spread, spread, n),
         rng.uniform(0, 2 * np.pi, n)], axis=-1)
    return poses


def test_get_vertices_parity(reference):
    ref = reference.collision_models
    rng = np.random.default_rng(0)
    for _ in range(100):
        pose = rng.uniform(-10, 10, 3)
        want = ref.get_vertices(pose, 0.58, 0.31)
        got = np.asarray(col.get_vertices(jnp.asarray(pose), 0.58, 0.31))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_perturbed_self_collision(reference):
    """A body always collides with a jittered copy of itself
    (reference collision_models.py:306-313, seed/scale preserved)."""
    np.random.seed(1234)
    a = np.array([[4, 11.0], [5, 5], [9, 9], [10, 10]])
    for _ in range(1000):
        b = a + np.random.normal(size=(4, 2)) / 100.0
        assert bool(col.collision(jnp.asarray(a), jnp.asarray(b)))


def test_pairwise_fuzz_parity(reference):
    """Random car-sized rectangles: SAT == reference GJK on every pair."""
    ref = reference.collision_models
    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(2, 7))
        # mix of near and far bodies to get a healthy collision rate
        spread = 1.0 if trial % 2 == 0 else 3.0
        poses = _rand_pose_verts(rng, n, spread)
        verts = np.stack([ref.get_vertices(p, 0.58, 0.31) for p in poses])

        want_c, want_i = ref.collision_multiple(verts)
        got_c, got_i = col.collision_multiple(jnp.asarray(verts))
        np.testing.assert_array_equal(np.asarray(got_c), want_c)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_collision_multiple_batched():
    rng = np.random.default_rng(3)
    poses = jnp.asarray(_rand_pose_verts(rng, 4 * 8, 1.5).reshape(8, 4, 3))
    verts = col.get_vertices(poses, 0.58, 0.31)          # (8, 4, 4, 2)
    c_b, i_b = col.collision_multiple(verts)
    for e in range(8):
        c1, i1 = col.collision_multiple(verts[e])
        np.testing.assert_array_equal(np.asarray(c_b[e]), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(i_b[e]), np.asarray(i1))


def test_separated_and_touching():
    a = col.get_vertices(jnp.array([0.0, 0.0, 0.0]), 0.58, 0.31)
    b = col.get_vertices(jnp.array([10.0, 0.0, 0.0]), 0.58, 0.31)
    assert not bool(col.collision(a, b))
    # exactly touching along x (share an edge): counts as NOT colliding,
    # matching the GJK <=0 convention
    t = col.get_vertices(jnp.array([0.58, 0.0, 0.0]), 0.58, 0.31)
    assert not bool(col.collision(a, t))
    # tiny interpenetration: collides
    o = col.get_vertices(jnp.array([0.57, 0.0, 0.0]), 0.58, 0.31)
    assert bool(col.collision(a, o))


@pytest.mark.slow
def test_pairwise_hits_from_poses_matches_collision_multiple():
    """The rectangle-SAT hot path (pose form, rolled pairing) agrees with
    the general quad SAT for 2..5 agents, dense and sparse spawns."""
    rng = np.random.default_rng(7)
    for a_n in (1, 2, 3, 4, 5):
        for spread in (0.5, 1.5, 4.0):   # dense -> many hits, sparse -> few
            poses = jnp.asarray(_rand_pose_verts(rng, 64 * a_n, spread)
                                .reshape(64, a_n, 3))
            verts = col.get_vertices(poses, 0.58, 0.31)
            want, _ = jnp.vectorize(col.collision_multiple,
                                    signature="(a,v,k)->(a),(a)")(verts)
            got = jnp.vectorize(
                lambda p: col.pairwise_hits_from_poses(p, 0.58, 0.31),
                signature="(a,k)->(a)")(poses)
            np.testing.assert_array_equal(
                np.asarray(got).astype(float), np.asarray(want),
                err_msg=f"agents={a_n} spread={spread}")


def test_pairwise_hits_per_agent_extents():
    """Per-agent (A,) length/width arrays: a long car hits where a short
    one would not."""
    poses = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    short = col.pairwise_hits_from_poses(poses, 0.58, 0.31)
    long_ = col.pairwise_hits_from_poses(
        poses, jnp.asarray([1.6, 0.58]), 0.31)
    assert not bool(short.any())
    assert bool(long_.all())


def test_pairwise_hits_batched_matches_collision_multiple():
    """A > 4 dispatches the batched (K, A) roll formulation of
    pairwise_hits_from_poses; its boolean must equal collision_multiple's
    any-hit flag for random fields, including overlap chains."""
    import numpy as np

    rng = np.random.default_rng(3)
    for A in (5, 6, 8, 13, 16):
        for trial in range(4):
            # mix of spread-out and crowded spawns to get real overlaps
            span = 3.0 if trial % 2 else 1.0
            poses = np.stack([rng.uniform(-span, span, A),
                              rng.uniform(-span, span, A),
                              rng.uniform(0, 2 * np.pi, A)], axis=-1)
            verts = col.get_vertices(jnp.asarray(poses), 0.58, 0.31)
            want, _ = col.collision_multiple(verts)
            got = col.pairwise_hits_from_poses(jnp.asarray(poses), 0.58, 0.31)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want).astype(bool),
                err_msg=f"A={A} trial={trial}")
