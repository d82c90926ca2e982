"""Dynamics kernel tests.

Mirrors the reference test strategy (reference:
gym/f110_gym/envs/dynamic_models.py:231-423): golden CommonRoad derivative
values with exact literals, singularity/property rollouts via odeint, plus
new parity fuzz tests against the reference kernels and batched-vmap checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import odeint

from red_gym_tpu.config import VehicleParams
from red_gym_tpu.ops import dynamics as dyn


# CommonRoad test vehicle (reference dynamic_models.py:233-253)
CR_PARAMS = dict(
    mu=1.0489,
    C_Sf=21.92 / 1.0489,
    C_Sr=21.92 / 1.0489,
    lf=0.3048 * 3.793293,
    lr=0.3048 * 4.667707,
    h=0.3048 * 2.01355,
    m=4.4482216152605 / 0.3048 * 74.91452,
    I=4.4482216152605 * 0.3048 * 1321.416,
    s_min=-1.066,
    s_max=1.066,
    sv_min=-0.4,
    sv_max=0.4,
    v_switch=7.319,
    a_max=11.5,
    v_min=-13.6,
    v_max=50.8,
)


@pytest.fixture(scope="module")
def p():
    return VehicleParams.from_dict(CR_PARAMS, dtype=jnp.float64)


def test_golden_derivatives(p):
    """Exact golden values (reference dynamic_models.py:255-279)."""
    f_ks_gt = [16.3475935934250209, 0.4819314886013121, 0.1500000000000000,
               5.1464424102339752, 0.2401426578627629]
    f_st_gt = [15.7213512030862397, 0.0925527979719355, 0.1500000000000000,
               5.3536773276413925, 0.0529001056654038, 0.6435589397748606,
               0.0313297971641291]

    x_ks = jnp.array([3.9579422297936526, 0.0391650102771405, 0.0378491427211811,
                      16.3546957860883566, 0.0294717351052816], dtype=jnp.float64)
    x_st = jnp.array([2.0233348142065677, 0.0041907137716636, 0.0197545248559617,
                      15.7216236334290116, 0.0025857914776859, 0.0529001056654038,
                      0.0033012170610298], dtype=jnp.float64)
    u = jnp.array([0.15, 0.63 * 9.81], dtype=jnp.float64)

    f_ks = dyn.vehicle_dynamics_ks(x_ks, u, p)
    f_st = dyn.vehicle_dynamics_st(x_st, u, p)

    assert np.max(np.abs(np.array(f_ks_gt) - np.asarray(f_ks))) == pytest.approx(0.0, abs=1e-14)
    assert np.max(np.abs(np.array(f_st_gt) - np.asarray(f_st))) == pytest.approx(0.0, abs=1e-14)


def _np_rhs(kind, p):
    def f(x, t, u):
        if kind == "st":
            return np.asarray(dyn.vehicle_dynamics_st(jnp.asarray(x), jnp.asarray(u), p))
        return np.asarray(dyn.vehicle_dynamics_ks(jnp.asarray(x), jnp.asarray(u), p))
    return f


@pytest.mark.parametrize(
    "u,st_gt,ks_gt",
    [
        # rolling car: zero input keeps zero state (dynamic_models.py:281-311)
        ([0.0, 0.0], [0.0] * 7, [0.0] * 5),
        # decelerating (dynamic_models.py:313-348)
        ([0.0, -0.7 * 9.81],
         [-3.4335000000000013, 0.0, 0.0, -6.8670000000000018, 0.0, 0.0, 0.0],
         [-3.4335000000000013, 0.0, 0.0, -6.8670000000000018, 0.0]),
        # accelerating with left steer (dynamic_models.py:350-386)
        ([0.15, 0.63 * 9.81],
         [3.0731976046859715, 0.2869835398304389, 0.15, 6.1802999999999999,
          0.1097747074946325, 0.3248268063223301, 0.0697547542798040],
         [3.0845676868494927, 0.1484249221523042, 0.15, 6.1803000000000017,
          0.1203664469224163]),
        # rolling with left steer (dynamic_models.py:388-423)
        ([0.15, 0.0],
         [0.0, 0.0, 0.15, 0.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.15, 0.0, 0.0]),
    ],
)
def test_zeroinit_odeint(p, u, st_gt, ks_gt):
    t = np.arange(0.0, 1.0, 1e-4)
    x0 = np.zeros(7)
    x_st = odeint(_np_rhs("st", p), x0, t, args=(np.array(u),))
    x_ks = odeint(_np_rhs("ks", p), x0[:5], t, args=(np.array(u),))
    assert np.all(np.abs(x_st[-1] - np.array(st_gt)) < 1e-2)
    assert np.all(np.abs(x_ks[-1] - np.array(ks_gt)) < 1e-2)


def test_parity_vs_reference_fuzz(reference, p):
    """Random states/inputs: our branch-free kernels bit-match the reference
    branchy kernels (reference dynamic_models.py:29-221)."""
    ref = reference.dynamic_models
    rng = np.random.default_rng(0)
    args = [CR_PARAMS[k] for k in
            ("mu", "C_Sf", "C_Sr", "lf", "lr", "h", "m", "I", "s_min", "s_max",
             "sv_min", "sv_max", "v_switch", "a_max", "v_min", "v_max")]

    xs = rng.uniform(-1, 1, size=(256, 7))
    xs[:, 3] = rng.uniform(-2.0, 55.0, size=256)  # cross the |v|<0.5 switch + v_max
    xs[: 16, 3] = rng.uniform(-0.6, 0.6, size=16)  # dense around the switch
    us = rng.uniform(-15, 15, size=(256, 2))

    ours = np.asarray(dyn.vehicle_dynamics_st(jnp.asarray(xs), jnp.asarray(us), p))
    for i in range(xs.shape[0]):
        want = ref.vehicle_dynamics_st(xs[i], us[i], *args)
        np.testing.assert_allclose(ours[i], want, rtol=0, atol=1e-12)

    ours_ks = np.asarray(dyn.vehicle_dynamics_ks(jnp.asarray(xs[:, :5]), jnp.asarray(us), p))
    for i in range(xs.shape[0]):
        want = ref.vehicle_dynamics_ks(xs[i, :5], us[i], *args)
        np.testing.assert_allclose(ours_ks[i], want, rtol=0, atol=1e-12)


def test_pid_parity_vs_reference(reference):
    ref = reference.dynamic_models
    rng = np.random.default_rng(1)
    for _ in range(200):
        speed, steer = rng.uniform(-10, 20), rng.uniform(-0.5, 0.5)
        cs, cst = rng.uniform(-10, 20), rng.uniform(-0.5, 0.5)
        if rng.random() < 0.2:
            cst = steer  # exercise the |diff|<1e-4 dead zone
        want_a, want_sv = ref.pid(speed, steer, cs, cst, 3.2, 9.51, 20.0, -5.0)
        got_a, got_sv = dyn.pid(jnp.float64(speed), jnp.float64(steer),
                                jnp.float64(cs), jnp.float64(cst),
                                3.2, 9.51, 20.0, -5.0)
        assert float(got_a) == pytest.approx(want_a, abs=1e-14)
        assert float(got_sv) == pytest.approx(want_sv, abs=1e-14)


def test_batched_matches_single(p):
    """A (env, agent)-batched call equals per-row calls — the vmap-free
    broadcasting contract every layer above relies on."""
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.uniform(-1, 20, size=(4, 3, 7)))
    us = jnp.asarray(rng.uniform(-10, 10, size=(4, 3, 2)))
    batched = dyn.vehicle_dynamics_st(xs, us, p)
    for i in range(4):
        for j in range(3):
            single = dyn.vehicle_dynamics_st(xs[i, j], us[i, j], p)
            np.testing.assert_array_equal(np.asarray(batched[i, j]), np.asarray(single))


def test_jit_grad_safe(p):
    """RHS is differentiable across the kinematic/dynamic switch (no NaNs)."""
    def loss(x):
        return jnp.sum(dyn.vehicle_dynamics_st(x, jnp.array([0.1, 1.0]), p) ** 2)

    for v in (0.0, 0.4999, 0.5001, 10.0):
        x = jnp.array([0.0, 0.0, 0.1, v, 0.2, 0.05, 0.01], dtype=jnp.float64)
        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))
